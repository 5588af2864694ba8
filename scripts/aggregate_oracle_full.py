"""Aggregate parallel driver_gate_check.py slice dumps into
ORACLE_FULL_r{N}.json (VERDICT r4 "Next round" #5): a committed,
regenerable artifact proving the FULL roster was oracle-replayed this
round — not just the driver's rotating 50-row window.

Protocol (slices run concurrently, 4 at a time on local[8]):

    python scripts/driver_gate_check.py 72 0   /tmp/oracle_slice_0.json
    python scripts/driver_gate_check.py 72 72  /tmp/oracle_slice_72.json
    ...                                  (offsets 0,72,...,504)
    python scripts/aggregate_oracle_full.py ORACLE_FULL_r05.json \
        /tmp/oracle_slice_*.json

Exit code 0 iff every roster entry is present exactly once and green
(rows+schema+values for oracle-twinned queries; rows-only for the
documented non-SQL-expressible ones).
"""

import json
import sys


def main() -> int:
    out_path, slice_paths = sys.argv[1], sys.argv[2:]
    merged: dict[str, dict] = {}
    for p in slice_paths:
        with open(p) as fh:
            part = json.load(fh)
        dup = set(part) & set(merged)
        if dup:
            print(f"overlapping slice entries: {sorted(dup)[:5]}")
            return 2
        merged.update(part)

    import __spark_entry__ as entry_mod
    roster = list(entry_mod.queries())
    missing = [n for n in roster if n not in merged]
    extra = [n for n in merged if n not in roster]

    def green(rec: dict) -> bool:
        return (rec.get("err") is None and rec.get("schema_match")
                and rec.get("rows_match")
                and rec.get("hash_match") in (True, None))

    failed = sorted(n for n, rec in merged.items() if not green(rec))
    summary = {
        "roster_size": len(roster),
        "replayed": len(merged),
        "green": len(merged) - len(failed),
        "failed": failed,
        "missing": missing,
        "extra": extra,
        "rows_only": sorted(n for n, rec in merged.items()
                            if rec.get("rows_only")),
        "sf_dir": "/root/testdata/sf0.01",
    }
    with open(out_path, "w") as fh:
        json.dump({"summary": summary,
                   "results": {n: merged[n] for n in roster
                               if n in merged}}, fh, indent=1)
    print(json.dumps(summary))
    return 0 if not (failed or missing or extra) else 1


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
