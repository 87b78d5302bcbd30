"""Splice refreshed provider rows into an existing results JSONL.

Kernel changes only touch OUR provider ("flash"); competitor rows
(xla, jax_flash, naive) measured in earlier sweeps are still valid.
Replacement is keyed on (provider, S, mode, D, causal): only target rows
whose exact key reappears in the fresh file are replaced, so a partial
rerun (e.g. attention_bench --seqs 16384) does not delete the provider's
rows for unmeasured shapes. D/causal consistency between fresh rows and
the target file is asserted.

Usage: python benchmarks/merge_rows.py TARGET.jsonl NEW_ROWS.jsonl [provider]
"""

from __future__ import annotations

import json
import sys


def _key(r: dict) -> tuple:
    return (r["provider"], r["S"], r["mode"], r.get("D"), r.get("causal"))


def main() -> None:
    target, fresh = sys.argv[1], sys.argv[2]
    provider = sys.argv[3] if len(sys.argv) > 3 else "flash"

    def _rows(path: str) -> list[dict]:
        # Sweeps may interleave non-JSON progress lines; keep records only.
        with open(path) as f:
            return [json.loads(line) for line in f
                    if line.strip().startswith("{")]

    # Keep only the requested provider's rows (a refresh file may carry
    # several providers; call once per provider to splice each).
    new_rows = [r for r in _rows(fresh) if r["provider"] == provider]
    assert new_rows, f"no {provider} rows in {fresh}"

    old_rows = _rows(target)

    # Fresh rows must describe the same experiment (D, causal) as the target.
    tgt_dims = {(r.get("D"), r.get("causal")) for r in old_rows}
    for r in new_rows:
        dim = (r.get("D"), r.get("causal"))
        assert dim in tgt_dims, (
            f"fresh row {dim} (D, causal) not present in {target}: {tgt_dims}")

    fresh_keys = {_key(r) for r in new_rows}
    kept = [r for r in old_rows if _key(r) not in fresh_keys]
    replaced = len(old_rows) - len(kept)

    merged = kept + new_rows
    merged.sort(key=lambda r: (r["S"], r["provider"], r["mode"]))
    with open(target, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
    print(f"{target}: kept {len(kept)} rows, replaced {replaced}, "
          f"spliced {len(new_rows)} {provider} rows")

    # Record->report regeneration is unskippable: any splice re-renders
    # RESULTS.md (tests/test_results_fresh.py fails the commit otherwise).
    import summarize

    summarize.regenerate()
    print("regenerated RESULTS.md")


if __name__ == "__main__":
    main()
