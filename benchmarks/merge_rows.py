"""Splice refreshed provider rows into an existing results JSONL.

Round-2 kernel changes only touch OUR provider ("flash"); competitor rows
(xla, jax_flash, naive) measured in the same round-1 sweeps are still valid.
This keeps them and replaces every row whose provider matches, preserving
the (S, provider, mode) sort order of the original file.

Usage: python benchmarks/merge_rows.py TARGET.jsonl NEW_ROWS.jsonl [provider]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    target, fresh = sys.argv[1], sys.argv[2]
    provider = sys.argv[3] if len(sys.argv) > 3 else "flash"

    with open(fresh) as f:
        new_rows = [json.loads(line) for line in f if line.strip()]
    assert all(r["provider"] == provider for r in new_rows), "provider mismatch"

    with open(target) as f:
        kept = [json.loads(line) for line in f
                if line.strip() and json.loads(line)["provider"] != provider]

    merged = kept + new_rows
    merged.sort(key=lambda r: (r["S"], r["provider"], r["mode"]))
    with open(target, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
    print(f"{target}: kept {len(kept)} rows, spliced {len(new_rows)} "
          f"{provider} rows")


if __name__ == "__main__":
    main()
