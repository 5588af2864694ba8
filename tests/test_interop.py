"""JSON-Schema round trips, describe/DDL, errors post-processing,
multimodal plumbing, streaming validation."""

import time

import pytest
from pyspark.sql import functions as F

import zoi_spark as z
import importlib

# the package re-exports describe() the FUNCTION, which shadows the
# submodule as a package attribute — load the module explicitly
dsc = importlib.import_module("zoi_spark.describe")
from zoi_spark import json_schema as js
from zoi_spark import multimodal, streaming
from zoi_spark.errors import prettify_errors, treefy_errors


def _user_schema():
    return z.fields({
        "name": z.string(min=2, max=100),
        "age": z.integer(gte=18).optional(),
        "email": z.email(),
        "tags": z.array(z.string(), min_length=1, unique_items=True),
        "role": z.enum(["admin", "user"]),
    })


def test_json_schema_export():
    enc = js.to_json_schema(_user_schema())
    assert enc["$schema"].endswith("2020-12/schema")
    assert enc["type"] == "object"
    p = enc["properties"]
    assert p["name"] == {"type": "string", "minLength": 2, "maxLength": 100}
    assert p["age"] == {"type": "integer", "minimum": 18}
    assert p["email"]["format"] == "email"
    assert p["tags"] == {"type": "array", "items": {"type": "string"},
                         "minItems": 1, "uniqueItems": True}
    assert p["role"] == {"enum": ["admin", "user"]}
    assert sorted(enc["required"]) == ["email", "name", "role", "tags"]


def test_json_schema_roundtrip():
    rt = js.from_json_schema(js.to_json_schema(_user_schema()))
    f = rt.params["fields"]
    assert f["age"].required is False
    assert f["name"].required is not False
    assert f["role"].kind == "enum"
    assert f["tags"].kind == "array"
    # re-export is stable
    assert js.to_json_schema(rt) == js.to_json_schema(_user_schema())


def test_json_schema_import_constructs():
    s = js.from_json_schema({
        "type": "object",
        "properties": {
            "v": {"anyOf": [{"type": "null"}, {"type": "string"}]},
            "n": {"type": "number", "exclusiveMinimum": 0, "multipleOf": 0.5},
            "u": {"type": "string", "format": "uuid"},
            "pair": {"allOf": [{"type": "string", "minLength": 2},
                               {"type": "string", "maxLength": 4}]},
        },
        "required": ["n"],
        "additionalProperties": False,
    })
    f = s.params["fields"]
    assert f["v"].nullable is True
    assert f["n"].kind == "number"
    assert f["pair"].kind == "intersection"
    assert s.params["unrecognized"] == "error"


def test_describe_and_ddl():
    text = dsc.describe(_user_schema())
    assert "**name**" in text and "gte(value=2)" in text
    assert "enum of [admin, user]" in text
    ddl = dsc.to_ddl(_user_schema())
    assert "name string NOT NULL" in ddl
    assert "age bigint" in ddl and "age bigint NOT NULL" not in ddl
    st = dsc.to_struct_type(_user_schema())
    assert st["tags"].dataType.simpleString() == "array<string>"


def test_treefy_and_prettify():
    rows = [
        {"path": ["user", "name"], "message": "is required"},
        {"path": ["tags", "0"], "message": "too small"},
        {"path": [], "message": "is invalid"},
    ]
    tree = treefy_errors(rows)
    assert tree["user"]["name"]["__errors__"] == ["is required"]
    assert tree["__errors__"] == ["is invalid"]
    pretty = prettify_errors(rows)
    assert pretty[0] == "is required, at user.name"
    assert pretty[1] == "too small, at tags[0]"
    assert pretty[2] == "is invalid"


def test_multimodal_fake_decode(spark):
    media = spark.createDataFrame(
        [(1, b"\x89PNG" + bytes(range(200))), (2, None), (3, b"abcd" * 50)],
        "media_id long, payload binary")
    feats = {r.media_id: r for r in multimodal.decode_image_features(
        media, deterministic_fake=True).collect()}
    assert feats[1].n_bytes == 204 and len(feats[1].feature) == 8
    assert feats[2].n_bytes == 0
    # deterministic across runs
    again = {r.media_id: r for r in multimodal.decode_image_features(
        media, deterministic_fake=True).collect()}
    assert feats[1].feature == again[1].feature

    # non-BMP without the fake flag: the batch raises at execution time
    # (the decode stub is per-payload now that BMP decodes for real)
    with pytest.raises(Exception, match="codec library"):
        multimodal.decode_image_features(media).collect()

    frames = multimodal.sample_frames(media, deterministic_fake=True,
                                      every_n=10, max_frames=3)
    out = frames.collect()
    assert {r.media_id for r in out} == {1, 3}
    assert max(r.frame_idx for r in out) <= 2

    stats = multimodal.binary_stats(media).collect()[0]
    assert stats.n_rows == 3 and stats.n_null == 1


def _golden_bmp():
    """4x2 24-bit BMP built from raw pixels: top row RGBW-ish, known
    channel means — the golden file for the real decode path."""
    import numpy as np
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]],
                   [[0, 0, 0], [10, 20, 30], [40, 50, 60], [70, 80, 90]]],
                  dtype=np.uint8)
    return px, multimodal.encode_bmp(px)


def test_bmp_roundtrip_and_real_decode(spark):
    import numpy as np
    px, payload = _golden_bmp()
    # pure-python round trip: encode → decode is exact
    assert (multimodal.decode_bmp(payload) == px).all()

    media = spark.createDataFrame([(1, payload), (2, b"\x89PNG" + bytes(60))],
                                  "media_id long, payload binary")
    feats = {r.media_id: r for r in multimodal.decode_image_features(
        media, deterministic_fake=True).collect()}
    real = feats[1]
    assert (real.width, real.height) == (4, 2)
    assert real.n_bytes == len(payload)
    f64 = px.astype("float64")
    exp = [round(float(v), 6) for v in f64.mean(axis=(0, 1))]
    assert [round(v, 6) for v in real.feature[:3]] == exp
    # std channels + gray min/max fill the remaining dims
    assert real.feature[6] == 0.0 and real.feature[7] == 255.0
    # the fake row keeps the seeded shape
    assert feats[2].width == (64 % 1920) + 1

    # real decode works WITHOUT the fake flag when payloads are BMP
    only_bmp = spark.createDataFrame([(9, payload)],
                                     "media_id long, payload binary")
    row = multimodal.decode_image_features(only_bmp).collect()[0]
    assert (row.width, row.height) == (4, 2)


def test_bmp_real_resize(spark):
    import numpy as np
    # 64x32 gradient image -> fit inside 16 => 16x8, thumb decodable
    w0, h0 = 64, 32
    px = np.zeros((h0, w0, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w0, dtype=np.uint8)[None, :]
    px[:, :, 1] = (np.arange(h0, dtype=np.uint8) * 8)[:, None]
    payload = multimodal.encode_bmp(px)
    media = spark.createDataFrame([(1, payload)],
                                  "media_id long, payload binary")
    row = multimodal.resize_images(media, max_side=16).collect()[0]
    assert (row.width, row.height) == (16, 8)
    thumb = multimodal.decode_bmp(bytes(row.thumb))
    assert thumb.shape == (8, 16, 3)
    # nearest-neighbor: sampled pixels come from the source grid
    assert thumb[0, 0, 0] == px[0, 0, 0]
    assert thumb[7, 15, 1] == px[28, 60, 1]


def test_media_metadata_rules(spark):
    df = spark.createDataFrame(
        [(1, "image/png", 100), (2, "bogus", 50), (3, "video/mp4", None)],
        "media_id long, mime string, width int")
    schema = z.fields({
        "media_id": z.integer(),
        "mime": z.string().regex(r"^(image|audio|video)/[a-z0-9.+-]+$"),
        "width": z.integer(gte=1).optional(),
    })
    res = z.validate(df, schema, ["media_id"])
    bad = {r.media_id for r in res.violations.collect()}
    assert bad == {2}


def test_codec_encode_direction(spark):
    import datetime as dt

    codec = z.codec(z.iso_date(), z.date(),
                    decode=lambda c: F.to_date(c),
                    encode=lambda c: F.date_format(c, "yyyy-MM-dd"))
    # forward: string → date
    df = spark.createDataFrame([(1, "2024-06-15")], "id int, v string")
    fwd = z.validate(df, z.fields({"id": z.integer(), "v": codec}), ["id"])
    assert {r.id: r.v for r in fwd.parsed.collect()}[1] == dt.date(2024, 6, 15)
    # reverse (Zoi.encode/3): date → ISO string
    df2 = spark.createDataFrame([(1, dt.date(2024, 6, 15))], "id int, v date")
    rev = z.encode(df2, z.fields({"id": z.integer(), "v": codec}), ["id"])
    assert rev.violations.count() == 0
    assert {r.id: r.v for r in rev.parsed.collect()}[1] == "2024-06-15"


def test_prepare_form_lenient_ingest(spark):
    df = spark.createDataFrame([(1, "", "42"), (2, "x", "")],
                               "id int, name string, age string")
    prepared = z.prepare_form(df)
    schema = z.coerce_all(z.fields({
        "id": z.integer(),
        "name": z.string(),
        "age": z.integer().optional(),
    }))
    res = z.validate(prepared, schema, ["id"])
    viols = [(r.id, r.rule_id) for r in res.violations.collect()]
    assert viols == [(1, "name.required")]  # "" → null → required
    parsed = {r.id: r for r in res.parsed.collect()}
    assert parsed[1].age == 42 and parsed[2].age is None


def test_streaming_validation(spark, tmp_path):
    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 100).load()
           .selectExpr("value as row_id",
                       "CAST(value % 3 AS STRING) as lang",
                       "timestamp as ts"))
    schema = z.fields({
        "row_id": z.integer().non_negative(),
        "lang": z.string().one_of(["0", "1"]),
        "ts": z.datetime(),
    })
    ann = streaming.validate_stream(sdf, schema)
    q = (ann.writeStream.format("memory").queryName("zoi_stream_test")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            n = spark.sql("select count(*) n from zoi_stream_test").collect()[0].n
            if n >= 30:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql(
        "select `__zoi_valid` as ok, count(*) n from zoi_stream_test group by 1"
    ).collect()
    counts = {r.ok: r.n for r in rows}
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
    # invalid rows are exactly lang == '2'
    mism = spark.sql(
        "select count(*) n from zoi_stream_test "
        "where `__zoi_valid` != (lang in ('0','1'))").collect()[0].n
    assert mism == 0


def test_streaming_windowed_violation_counts(spark):
    """Event-time windowed per-rule violation rates with a watermark —
    the streaming analogue of summary() (readStream → window agg →
    broadcast catalog join after the agg)."""
    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 200).load()
           .selectExpr("value as row_id",
                       "CAST(value % 3 AS STRING) as lang",
                       "timestamp as ts"))
    schema = z.fields({
        "row_id": z.integer().non_negative(),
        "lang": z.string().one_of(["0", "1"]),
        "ts": z.datetime(),
    })
    win = streaming.windowed_violation_counts(
        sdf, schema, ts_col="ts", window="2 seconds", watermark="2 seconds")
    q = (win.writeStream.format("memory").queryName("zoi_win_test")
         .outputMode("append")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from zoi_win_test").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows, "no closed windows emitted"
    assert {r.rule_id for r in rows} == {"lang.one_of"}
    assert all(r.n_violations > 0 for r in rows)
    assert all(r.window_end > r.window_start for r in rows)


def test_streaming_microbatch_manifest(spark, tmp_path):
    """foreachBatch bridge: each micro-batch appends the same
    per-partition manifest rows as a batch run (run_id = batch id)."""
    import pyspark.sql.functions as SF

    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 500).load()
           .selectExpr("value as row_id",
                       "CAST(value % 3 AS STRING) as lang"))
    schema = z.fields({
        "row_id": z.integer().non_negative(),
        "lang": z.string().one_of(["0", "1"]),
    })
    manifest = str(tmp_path / "stream_manifest")
    q = streaming.run_microbatch_manifest(
        sdf, schema, id_col="row_id", n_partitions=8,
        manifest_dir=manifest, checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=False)
    try:
        deadline = time.time() + 45
        ok = False
        while time.time() < deadline:
            try:
                m = spark.read.parquet(manifest)
                if m.count() >= 8:
                    ok = True
                    break
            except Exception:
                pass
            time.sleep(2)
    finally:
        q.stop()
    assert ok, "manifest never materialized"
    m = spark.read.parquet(manifest)
    assert {"run_id", "partition_id", "status", "n_rows", "n_violations",
            "schema_fingerprint", "input_lineage"} <= set(m.columns)
    assert m.where(SF.col("status") == "fail").count() > 0


def test_streaming_stateful_violation_tracker(spark):
    """applyInPandasWithState: cumulative per-key counts grow across
    micro-batches; the all-violating key converges to rate 1.0."""
    import time as _t

    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 200).load()
           .selectExpr("value as row_id",
                       "CAST(value % 3 AS STRING) as lang"))
    schema = z.fields({
        "row_id": z.integer().non_negative(),
        "lang": z.string().one_of(["0", "1"]),
    })
    out = streaming.stateful_violation_tracker(sdf, schema, key_col="lang")
    q = (out.writeStream.format("memory").queryName("zoi_state_test")
         .outputMode("update")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = _t.time() + 45
        rows = []
        while _t.time() < deadline:
            rows = spark.sql(
                "select key, max(n_rows) n, max(n_invalid) b "
                "from zoi_state_test group by key").collect()
            if len(rows) == 3 and min(r.n for r in rows) >= 20:
                break
            _t.sleep(1)
    finally:
        q.stop()
    got = {r.key: (r.n, r.b) for r in rows}
    assert set(got) == {"0", "1", "2"}
    assert got["2"][0] == got["2"][1] > 0       # every '2' row violates
    assert got["0"][1] == 0 and got["1"][1] == 0


def test_multimodal_resize_stub(spark):
    """resize_images: real mapInPandas plumbing + fit-inside scaling
    math over the deterministic fake decode; raises without the fake."""
    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, b"\xff" * 64), (3, b"")],
        "media_id long, payload binary")
    out = {r.media_id: r for r in multimodal.resize_images(
        df, max_side=64, deterministic_fake=True).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert max(r.width, r.height) <= 64 and min(r.width, r.height) >= 1
        assert isinstance(r.thumb, (bytes, bytearray))
    with pytest.raises(Exception, match="codec libraries"):
        multimodal.resize_images(df).collect()


def test_wav_roundtrip_and_real_audio_decode(spark):
    import numpy as np
    sq = np.array([3000, -3000] * 10, dtype=np.int16)
    payload = multimodal.encode_wav(sq, 16000)
    rate, frames = multimodal.decode_wav(payload)
    assert rate == 16000 and (frames[:, 0] == sq).all()

    # chunk-walk robustness: an extra LIST chunk before `data`
    extra = (payload[:12] + b"LIST" + (4).to_bytes(4, "little") + b"INFO"
             + payload[12:])
    fixed = extra[:4] + (len(extra) - 8).to_bytes(4, "little") + extra[8:]
    rate2, frames2 = multimodal.decode_wav(fixed)
    assert rate2 == 16000 and (frames2 == frames).all()

    media = spark.createDataFrame(
        [(1, payload), (2, b"\xffOGG" + bytes(60))],
        "media_id long, payload binary")
    rows = {r.media_id: r for r in multimodal.decode_audio_features(
        media, deterministic_fake=True).collect()}
    real = rows[1]
    assert real.sample_rate == 16000 and real.n_frames == 20
    assert real.rms == 3000.0 and real.peak == 3000
    assert real.zero_cross_rate == 1.0
    assert real.duration_ms == 1.25
    with pytest.raises(Exception, match="codec library"):
        multimodal.decode_audio_features(media).collect()


def test_y4m_real_frame_sampling(spark):
    import numpy as np
    lumas = [np.full((4, 6), 10 * (i + 1), dtype=np.uint8)
             for i in range(9)]
    payload = multimodal.encode_y4m(lumas, fps=(30, 1))
    w, h, fps, fl = multimodal.decode_y4m(payload)
    assert (w, h, fps, len(fl)) == (6, 4, (30, 1), 9)

    media = spark.createDataFrame([(1, payload)],
                                  "media_id long, payload binary")
    rows = sorted((r.frame_idx, bytes(r.frame)) for r in
                  multimodal.sample_frames(media, every_n=3,
                                           max_frames=2).collect())
    assert [i for i, _ in rows] == [0, 3]     # source frame numbers
    # the sampled frame is the REAL luma plane
    y0 = np.frombuffer(rows[0][1][:24], dtype=np.uint8)
    y3 = np.frombuffer(rows[1][1][:24], dtype=np.uint8)
    assert y0.mean() == 10.0 and y3.mean() == 40.0
    # compressed video without the fake flag still raises
    mp4 = spark.createDataFrame([(2, b"\x00\x00\x00 ftypmp42" + bytes(40))],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="codec library"):
        multimodal.sample_frames(mp4).collect()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup_stream drops key re-deliveries and (in content mode)
    byte-identical re-crawls under different urls, with bounded state
    (dropDuplicatesWithinWatermark evicts keys past the horizon)."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("http://a.com/1", t0, "alpha body"),
        ("http://a.com/1", t0 + dt.timedelta(minutes=1), "alpha body"),
        ("http://b.com/2", t0, "beta body"),
        ("http://c.com/3", t0 + dt.timedelta(minutes=2), "alpha body"),
    ]
    src = tmp_path / "in"
    (spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
     .coalesce(1).write.parquet(str(src)))
    sdf = (spark.readStream.schema("url string, warc_ts timestamp, text string")
           .parquet(str(src)))

    out = streaming.dedup_stream(sdf, id_col="url", ts_col="warc_ts")
    q = (out.writeStream.format("memory").queryName("zoi_dedup_url")
         .option("checkpointLocation", str(tmp_path / "ck1"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    urls = sorted(r.url for r in spark.sql(
        "select url from zoi_dedup_url").collect())
    assert urls == ["http://a.com/1", "http://b.com/2", "http://c.com/3"]

    out2 = streaming.dedup_stream(sdf, id_col="url", ts_col="warc_ts",
                                  text_col="text")
    q2 = (out2.writeStream.format("memory").queryName("zoi_dedup_content")
          .option("checkpointLocation", str(tmp_path / "ck2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(60)
    rows2 = spark.sql("select text from zoi_dedup_content").collect()
    # content mode: the c.com re-crawl of "alpha body" collapses too
    assert sorted(r.text for r in rows2) == ["alpha body", "beta body"]
    assert "__zoi_fp" not in spark.table("zoi_dedup_content").columns


def test_dhash_known_bitpatterns(spark):
    """The three analytic dHash fixtures: uniform image -> 0, column
    checkerboard -> alternating bits, strictly descending gradient ->
    all 64 bits set (signed -1)."""
    import numpy as np

    flat = np.full((6, 11, 3), 77, dtype=np.uint8)
    assert multimodal.dhash_bmp(flat) == 0
    checker = np.zeros((8, 9, 3), dtype=np.uint8)
    checker[:, 1::2, :] = 255
    assert multimodal.dhash_bmp(checker) == -6148914691236517206
    grad = np.zeros((8, 18, 3), dtype=np.uint8)
    for c in range(18):
        grad[:, c, :] = 255 - c * 14
    assert multimodal.dhash_bmp(grad) == -1

    # resized copy of the gradient hashes identically (the point of a
    # perceptual hash): nearest-neighbor grid is scale-invariant here
    grad2 = np.repeat(np.repeat(grad, 2, axis=0), 2, axis=1)
    assert multimodal.dhash_bmp(grad2) == -1

    media = spark.createDataFrame(
        [(1, multimodal.encode_bmp(checker)), (2, None)],
        "media_id long, payload binary")
    rows = {r.media_id: r for r in
            multimodal.image_dhash(media).collect()}
    assert (rows[1].width, rows[1].height) == (9, 8)
    assert rows[1].dhash == -6148914691236517206
    assert (rows[2].width, rows[2].height, rows[2].dhash) == (0, 0, 0)

    bad = spark.createDataFrame([(3, b"\x89PNG" + bytes(40))],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="codec library"):
        multimodal.image_dhash(bad).collect()


def test_scene_cuts_boundary_and_stubs(spark):
    import numpy as np

    def clip(lumas):
        return multimodal.encode_y4m(
            [np.full((4, 6), v, dtype=np.uint8) for v in lumas])

    media = spark.createDataFrame(
        [(0, clip([0, 0, 200, 200])),    # one 200-jump
         (1, clip([0, 100, 100])),       # exactly at threshold: NO cut
         (2, None)],
        "media_id long, payload binary")
    out = {r.media_id: r for r in
           multimodal.scene_cuts(media, threshold=100.0).collect()}
    assert (out[0].n_frames, out[0].n_cuts, out[0].max_diff) \
        == (4, 1, 200.0)
    assert (out[1].n_cuts, out[1].max_diff) == (0, 100.0)
    assert (out[2].n_frames, out[2].n_cuts) == (0, 0)

    bad = spark.createDataFrame([(3, b"\x00\x01" * 40)],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="codec library"):
        multimodal.scene_cuts(bad).collect()


def test_audio_silence_mixdown_and_runs(spark):
    import numpy as np

    def wav(arr):
        return multimodal.encode_wav(np.array(arr, dtype=np.int16),
                                     8000)

    media = spark.createDataFrame(
        [(0, wav([0] * 10 + [5000] * 5 + [0] * 5)),
         (1, wav([[300, -300]] * 4)),     # stereo mixdown cancels
         (2, wav([0, 5000] * 4)),
         (3, None)],
        "media_id long, payload binary")
    out = {r.media_id: r for r in
           multimodal.audio_silence(media, threshold=256).collect()}
    assert (out[0].n_frames, out[0].silence_ratio,
            out[0].longest_silence) == (20, 0.75, 10)
    assert (out[1].silence_ratio, out[1].longest_silence) == (1.0, 4)
    assert (out[2].silence_ratio, out[2].longest_silence) == (0.5, 1)
    assert (out[3].n_frames, out[3].longest_silence) == (0, 0)

    bad = spark.createDataFrame([(4, b"\x01\x02" * 30)],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="codec library"):
        multimodal.audio_silence(bad).collect()


def test_stream_psi_drift_flags_shifted_window(spark, tmp_path):
    """Two one-minute windows: the first mirrors the baseline mix, the
    second is all-'en' — only the second drifts, and only windows the
    final watermark closed are emitted."""
    import pytest
    from pyspark.sql import functions as F
    from zoi_spark import streaming

    rows = []
    # window 0 (t=0..59): 5 en + 5 de  — matches baseline 50/50
    for i in range(5):
        rows += [(i, 10 + i, "en"), (100 + i, 20 + i, "de")]
    # window 1 (t=60..119): 10 en — drifted
    for i in range(10):
        rows.append((200 + i, 70 + i, "en"))
    # window 5 (t=300): late sentinel advancing the watermark so
    # windows 0 and 1 both close (wm = 300 - 120 = 180)
    rows.append((999, 300, "en"))
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, "id long, sec long, lang string") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec"))) \
        .coalesce(1).write.parquet(in_dir)
    baseline = spark.createDataFrame(
        [("en", 0.5), ("de", 0.5)], "lang string, share double")
    batch = spark.read.parquet(in_dir)
    sdf = spark.readStream.schema(batch.schema).parquet(in_dir)
    out = streaming.stream_psi_drift(sdf, baseline, ts_col="ts",
                                     key_col="lang",
                                     window="1 minute",
                                     watermark="2 minutes")
    q = (out.writeStream.format("memory").queryName("zoi_psi_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["window_start"].second + r["window_start"].minute * 60: r
           for r in spark.sql("select * from zoi_psi_test").collect()}
    assert set(got) == {0, 60}  # window 5 stays open in state
    assert got[0]["psi_present"] == pytest.approx(0.0, abs=1e-6)
    assert not got[0]["drifted"] and got[0]["missing_share"] == 0.0
    assert got[60]["drifted"] and got[60]["n"] == 10
    assert got[60]["missing_share"] == pytest.approx(0.5)
