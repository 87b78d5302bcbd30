"""Render benchmarks/results/*.jsonl into benchmarks/RESULTS.md — one
glanceable markdown table per benchmark family, pinned at the plateau
sequence length (the reference reports S=16384 plateaus the same way).

  python benchmarks/summarize.py [-s 16384] [-o benchmarks/RESULTS.md]
"""

from __future__ import annotations

import argparse
import json
import pathlib
from collections import defaultdict

HERE = pathlib.Path(__file__).parent


def load(results_dir: pathlib.Path):
    recs = []
    for p in sorted(results_dir.glob("*.jsonl")):
        for line in p.read_text().splitlines():
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                r["_file"] = p.name
                recs.append(r)
    return recs


def attention_table(recs, s_plateau: int) -> list[str]:
    cells = defaultdict(dict)  # (D, causal, mode) -> provider -> tflops
    for r in recs:
        if "tflops" not in r or r.get("S") != s_plateau:
            continue
        if "provider" not in r or r.get("tflops") is None:
            continue  # probe/crossover rows and nulled failure rows
        key = (r["D"], bool(r["causal"]), r["mode"])
        cells[key][r["provider"]] = r["tflops"]
    if not cells:
        return []
    providers = sorted({p for v in cells.values() for p in v})
    lines = [
        f"## Attention kernels (TFLOPS @ S={s_plateau}, B=4 H=8 bf16)",
        "",
        "| D | causal | mode | " + " | ".join(providers) + " |",
        "|---|---|---|" + "---|" * len(providers),
    ]
    for (d, causal, mode) in sorted(cells):
        row = cells[(d, causal, mode)]
        vals = " | ".join(
            f"**{row[p]}**" if p == "flash" and row.get(p) ==
            max(v for v in row.values()) else str(row.get(p, "—"))
            for p in providers)
        lines.append(
            f"| {d} | {'yes' if causal else 'no'} | {mode} | {vals} |")
    lines.append("")
    return lines


def decode_table(recs) -> list[str]:
    # Canonical file only: A/B arm files (e.g. v5e_decode_hfuse*.jsonl)
    # carry the same bench= tag, and splicing all of them in would show
    # duplicate (S, dtype) rows. The winning arm is promoted to the
    # canonical name (benchmarks/README.md promote-on-success convention).
    rows = [r for r in recs if r.get("bench") == "decode_kernel"
            and r["_file"] == "v5e_decode_kernel.jsonl"]
    if not rows:
        return []
    lines = [
        "## Decode kernel (HBM streaming)",
        "",
        "| S | KV dtype | µs | GB/s | % of HBM peak | block_kv |",
        "|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: (r["S"], r["quant"])):
        lines.append(
            f"| {r['S']} | {r['quant']} | {r['us']} | {r['hbm_gbps']} | "
            f"{round(100 * r['hbm_frac'], 1)}% | {r.get('block_kv', '—')} |")
    lines.append("")
    return lines


def misc_tables(recs) -> list[str]:
    lines = []
    for bench, title in (("serve_device", "Serving (device-time)"),
                         ("serve", "Serving (drain throughput)"),
                         ("serve_prefix", "Serving (shared-prefix cache)"),
                         ("train_step", "Training (1 chip)"),):
        # superseded=true marks rows kept only as provenance for an older
        # code revision (e.g. the round-2 serve numbers measured before the
        # captured-constants fix); the table shows current claims only.
        rows = [r for r in recs if r.get("bench") == bench
                and not r.get("superseded")]
        if not rows:
            continue
        keys = [k for k in rows[0] if not k.startswith("_") and k != "bench"]
        lines += [f"## {title}", "",
                  "| " + " | ".join(keys) + " |",
                  "|" + "---|" * len(keys)]
        for r in rows:
            lines.append("| " + " | ".join(str(r.get(k, "—"))
                                           for k in keys) + " |")
        lines.append("")
    return lines


def render(results_dir: pathlib.Path | None = None,
           plateau: int = 16384) -> str:
    """RESULTS.md content derived purely from the committed JSONLs.
    tests/test_results_fresh.py re-renders and fails on any drift, so a
    bench run that records rows without regenerating cannot be committed."""
    recs = load(results_dir or HERE / "results")
    lines = ["# Measured results (v5e, one chip via tunnel)", "",
             "Regenerate: `python benchmarks/summarize.py` after a sweep; "
             "record provenance is the JSONLs in `benchmarks/results/`.", ""]
    lines += attention_table(recs, plateau)
    lines += decode_table(recs)
    lines += misc_tables(recs)
    return "\n".join(lines) + "\n"


def regenerate() -> None:
    """Re-render RESULTS.md in place — bench scripts call this after every
    JSONL write (VERDICT r3: records were updated without regenerating the
    human-facing layer, twice)."""
    (HERE / "RESULTS.md").write_text(render())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--plateau", type=int, default=16384)
    ap.add_argument("-o", "--out", default=str(HERE / "RESULTS.md"))
    ap.add_argument("--results", default=str(HERE / "results"))
    args = ap.parse_args()
    text = render(pathlib.Path(args.results), args.plateau)
    pathlib.Path(args.out).write_text(text)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
