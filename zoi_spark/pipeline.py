"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, built ONLY from this package's operators.

    validate → quality gate → exact dedup → near-dup cluster dedup

Stage shapes at 100 TB (every stage is lazy until materialized):

1. **validate** — one scan-projection, no shuffle; invalid rows drop
   (schema violations are the cheapest filter, run first).
2. **quality gate** — pure Column expressions (text.quality_score,
   optional lang allow-list), fused into the same scan.
3. **exact dedup** — one hash shuffle on the md5 fingerprint
   (dedup.exact_dedup window keep-min-id).
4. **near-dup dedup** — MinHash-LSH candidates (+ optional mega-bucket
   cap) → exact-Jaccard verify → connected components → drop every doc
   whose cluster_id differs from its own id. Pair work is proportional
   to bucket collisions, never n².

The returned frame is the KEPT corpus; ``report()`` runs the per-stage
counting jobs (each one aggregation) for the curation ledger. Cache
lifecycle: the LSH bucket table the pair stage persists is carried on
``CurationResult.caches`` — call ``release()`` once the kept corpus has
been materialized (at 100 TB the (id, band, bucket) table is not small
and would otherwise stay pinned for the session).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text
from .schema import Schema
from .validate import validate


@dataclass
class CurationResult:
    kept: DataFrame
    stages: dict  # stage name -> lazy DataFrame after that stage
    text_col: str = "text"
    # persisted frames owned by this run (LSH bucket table); release()
    # unpersists them once the kept corpus is materialized
    caches: list = dc_field(default_factory=list)
    converged: bool = True

    def report(self, kept_materialized: DataFrame | None = None) -> dict:
        """Stage ledger: rows surviving each stage (one count job per
        stage) + kept-corpus token totals in one aggregation.

        Pass ``kept_materialized`` (e.g. the parquet the kept corpus
        was just written to) to source every kept-corpus leg from it —
        otherwise the final count AND the token aggregation re-execute
        the whole near-dup chain, the dominant cost of the pipeline.
        """
        kept = kept_materialized if kept_materialized is not None \
            else self.kept
        out = {}
        for name, df in self.stages.items():
            out[name] = kept.count() if df is self.kept else df.count()
        toks = kept.agg(
            F.sum(text.token_count(F.col(self.text_col))).alias("ws"),
            F.sum(text.bpe_ish_token_count(F.col(self.text_col)))
            .alias("bpe")).collect()[0]
        out["kept_ws_tokens"] = int(toks.ws or 0)
        out["kept_bpe_tokens"] = int(toks.bpe or 0)
        return out

    def release(self) -> None:
        """Unpersist every cache this run pinned (call after the kept
        corpus has been written/collected)."""
        for df in self.caches:
            df.unpersist()
        self.caches.clear()


def curate(df: DataFrame, schema: Schema, *, id_col: str,
           text_col: str = "text",
           min_quality: float = 0.0,
           allowed_langs: Sequence[str] | None = None,
           lang_col: str | None = None,
           url_col: str | None = None,
           url_filter: bool = False,
           drop_pii: bool = False,
           strip_frequent_lines_min_docs: int | None = None,
           c4_filter: dict | None = None,
           gopher: dict | None = None,
           max_dup_ngram_fraction: float | None = None,
           near_dup_threshold: float = 0.85,
           minhash_bands: int | str = "auto",
           max_bucket_size: int | str | None = "auto",
           cluster_max_iters: int | str = "auto",
           approx_rows: int | None = None,
           decontam_probes: DataFrame | None = None,
           decontam_ngram: int = 13,
           decontam_fuzzy_threshold: float | None = None,
           probe_id_col: str = "probe_id",
           probe_text_col: str = "probe_text",
           split_weights: "dict[str, float] | None" = None) -> CurationResult:
    """Run the full curation composition; see module docstring for the
    per-stage plan shapes. If cluster label propagation fails to
    converge within ``cluster_max_iters`` (already warned by
    duplicate_clusters), the result's ``converged`` flag is False —
    check it before trusting the drop list.

    Optional intake stages (both fused into the early cheap passes):

    * ``url_col`` — URL-level dedup FIRST (urls.url_dedup keep-min-id
      on the canonical form): one string projection + one window, the
      cheapest collapse of re-crawled resources, run before any
      content hashing.
    * ``url_filter=True`` (with ``url_col``) — FineWeb-style URL
      quality battery (urls.url_quality_flags) BEFORE url dedup: a
      rejected url costs one string projection, never a text pass.
    * ``drop_pii=True`` — drop documents with email/IP/phone-shaped
      matches (text PII flags) inside the same quality-gate scan.

    Line-level correction (RefinedWeb ordering: after URL/validity
    intake, before the document-level quality gate); both stages write
    a NEW cleaned column and every later stage (quality, dedup,
    token ledger) runs on it — the original *text_col* bytes are never
    rewritten:

    * ``strip_frequent_lines_min_docs`` — remove corpus-frequent
      boilerplate lines (text.strip_boilerplate; one extra mining
      aggregation + a broadcast of the capped drop set).
    * ``c4_filter`` — kwargs for text.c4_line_filter (e.g.
      ``{"min_words": 3, "require_terminal": False}``); pure
      projection, fused into the scan.

    Documents left empty by line correction are dropped.

    Document-level admission gates (both run with the quality gate, on
    the line-corrected text):

    * ``gopher`` — kwargs for text.gopher_quality_flags (pass ``{}``
      for the defaults); documents failing any Gopher rule drop. Pure
      column expressions, fused into the gate scan.
    * ``max_dup_ngram_fraction`` — drop documents whose cross-corpus
      duplicated 5-gram share (text.dup_ngram_fraction) exceeds the
      cap: the substring-level complement to whole-doc dedup. Costs
      one extra keyed aggregation + an anti-join on the over-cap ids
      (the drop side — smaller than the corpus by construction).

    Blocking knobs default to ``"auto"`` so the deployable CLI path is
    scale-safe with no operator tuning:

    * ``minhash_bands`` — from ``near_dup_threshold`` alone
      (dedup.suggest_minhash_bands, the MMDS S-curve optimum); no data
      peek.
    * ``max_bucket_size`` — pair-work-bounded cap
      (dedup.suggest_max_bucket_size); corpus-size-independent by
      design.
    * ``cluster_max_iters`` — ``log2(n)+8`` rounds
      (dedup.suggest_cluster_iters) from ``approx_rows``; when auto is
      requested and ``approx_rows`` is None, ONE ``df.count()`` job
      runs at build time (negligible next to the dedup it sizes, but
      it does break full laziness — pass ``approx_rows`` from a count
      you already have, or an integer knob, to avoid it).

    Benchmark decontamination (``decontam_probes`` = a
    (probe_id, probe_text) frame of eval/benchmark documents) runs
    LAST, on the near-dup survivors — every earlier stage only shrinks
    the side that must be gram-exploded, and a contaminated document
    dropped by dedup needs no check at all:

    * default: the exact GPT-3/PaLM protocol — drop any document
      sharing a word ``decontam_ngram``-gram (13 classically) with any
      probe (text.ngram_decontamination).
    * ``decontam_fuzzy_threshold`` — use the MinHash-LSH cross-corpus
      join instead (dedup.minhash_lsh_join): drop documents whose
      shingle Jaccard against any probe reaches the threshold, which
      catches paraphrased/reflowed near-copies that share no exact
      13-gram. ``id_col`` must differ from ``probe_id_col``.

    The contaminated-id list is benchmark-bounded (≤ docs that matched
    a probe), so AQE broadcasts the final anti-join.

    ``split_weights`` (e.g. ``{"train": .8, "val": .1, "test": .1}``)
    stamps the kept corpus with a deterministic, recrawl-stable
    ``split`` column (sampling.hash_split) as the very last step — the
    output is then directly partitionable by split at write time.
    """
    if cluster_max_iters == "auto":
        if approx_rows is None:
            approx_rows = df.count()
        cluster_max_iters = dedup.suggest_cluster_iters(approx_rows)
    if minhash_bands == "auto":
        minhash_bands = dedup.suggest_minhash_bands(
            num_hashes=64, threshold=near_dup_threshold)
    if max_bucket_size == "auto":
        max_bucket_size = dedup.suggest_max_bucket_size(approx_rows)

    res = validate(df, schema, id_cols=[id_col])
    valid = res.valid_rows

    if url_col is not None:
        from . import urls
        if url_filter:
            pre = valid.columns
            valid = (urls.url_quality_flags(valid, url_col=url_col)
                     .where(F.col("url_pass")).select(*pre))
        valid = urls.url_dedup(valid, url_col=url_col, id_col=id_col)

    work_col = text_col
    if strip_frequent_lines_min_docs is not None:
        valid = text.strip_boilerplate(
            valid, text_col=work_col, id_col=id_col,
            min_docs=strip_frequent_lines_min_docs,
            out_col="__line_clean").drop("n_lines", "n_kept")
        work_col = "__line_clean"
    if c4_filter is not None:
        valid = text.c4_line_filter(
            valid, text_col=work_col, out_col="__c4_clean",
            **c4_filter).drop("n_lines", "n_kept")
        work_col = "__c4_clean"
    if work_col != text_col:
        valid = valid.where(F.length(F.trim(F.col(work_col))) > 0)
        if work_col == "__c4_clean" and strip_frequent_lines_min_docs \
                is not None:
            # the boilerplate stage's intermediate column was
            # superseded by the C4 pass — don't carry a second full
            # copy of every document through the rest of the pipeline
            valid = valid.drop("__line_clean")
    text_col = work_col

    gated = valid.where(
        text.quality_score(F.col(text_col)) >= F.lit(min_quality))
    if allowed_langs is not None:
        lc = (F.col(lang_col) if lang_col
              else text.lang_id(F.col(text_col)))
        gated = gated.where(lc.isin(*allowed_langs))
    if drop_pii:
        c = F.col(text_col)
        gated = gated.where(
            (text.pii_email_count(c) + text.pii_ipv4_count(c)
             + text.pii_phone_count(c)) == 0)
    if gopher is not None:
        pre = gated.columns
        gated = (text.gopher_quality_flags(gated, text_col=text_col,
                                           **gopher)
                 .where(F.col("gopher_pass")).select(*pre))
    extra_caches: list = []
    if max_dup_ngram_fraction is not None:
        frac = text.dup_ngram_fraction(valid, text_col=text_col,
                                       id_col=id_col)
        extra_caches += getattr(frac, "_zoi_persisted", [])
        over = (frac.where(F.col("dup_fraction") > max_dup_ngram_fraction)
                .select(F.col(id_col).alias("__dng_drop")))
        gated = gated.join(over, gated[id_col] == F.col("__dng_drop"),
                           "left_anti")

    exact = dedup.exact_dedup(gated, text_col=text_col, id_col=id_col)

    pairs = dedup.minhash_dedup_pairs(
        exact, id_col=id_col, text_col=text_col,
        threshold=near_dup_threshold, bands=minhash_bands,
        max_bucket_size=max_bucket_size)
    clusters = dedup.duplicate_clusters(pairs, id_a="id_a", id_b="id_b",
                                        max_iters=cluster_max_iters)
    drop = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias("__drop_id")))
    # NOT broadcast: web corpora can be 20-40% near-duplicates, so the
    # drop list scales with the corpus — a shuffled left_anti on the id
    # is the safe plan (AQE downgrades it to broadcast when it IS small)
    kept = exact.join(drop, exact[id_col] == F.col("__drop_id"), "left_anti")

    caches = list(getattr(pairs, "_zoi_persisted", []) or []) + extra_caches
    stages = {"input": df, "valid": valid, "quality": gated,
              "exact_dedup": exact, "near_dedup": kept}
    if decontam_probes is not None:
        if decontam_fuzzy_threshold is not None:
            # bands=32 over 64 hashes (r=2): decontamination is a
            # recall-first gate — at the 0.5-0.6 thresholds it runs at,
            # r=2 keeps per-pair miss probability ~1e-6 where the dedup
            # default r=4 would miss ~1 in 3 threshold-grazing pairs
            hits = dedup.minhash_lsh_join(
                kept, decontam_probes, left_id=id_col,
                left_text=text_col, right_id=probe_id_col,
                right_text=probe_text_col,
                threshold=decontam_fuzzy_threshold,
                num_hashes=64, bands=32,
                max_bucket_size=(max_bucket_size
                                 if isinstance(max_bucket_size, int)
                                 else None))
            caches += list(getattr(hits, "_zoi_persisted", []) or [])
        else:
            hits = text.ngram_decontamination(
                kept, decontam_probes, text_col=text_col, id_col=id_col,
                probe_id_col=probe_id_col, probe_text_col=probe_text_col,
                n=decontam_ngram)
        contaminated = (hits.select(F.col(id_col).alias("__ct_drop"))
                        .distinct())
        kept = kept.join(contaminated,
                         kept[id_col] == F.col("__ct_drop"), "left_anti")
        stages["decontaminated"] = kept
    if split_weights:
        from . import sampling
        kept = sampling.hash_split(kept, id_col=id_col,
                                   weights=split_weights)
    return CurationResult(
        kept=kept,
        stages=stages,
        text_col=text_col,
        caches=caches,
        converged=getattr(clusters, "_zoi_converged", True))
