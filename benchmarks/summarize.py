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
    lines += [
        "",
        "`bwd` rows are DERIVED as fwd_bwd − fwd (reference convention, "
        "`Performance_Comparison.py:92-95`). For providers whose "
        "standalone forward differs from the forward inside their "
        "autodiff program (jax_flash's `save_residuals` split), the "
        "subtraction can exceed chip peak — compare `fwd` and `fwd_bwd` "
        "(measured walls) across providers, not derived `bwd`.",
        "",
    ]
    return lines


def attention_sweep_table(recs) -> list[str]:
    """The shallow-S causal D=128 forward sweep — the one region the
    round-4 matrix lost to jax_flash; reported at every S like the
    reference's full curves (Performance_Comparison.py:146-166)."""
    cells = defaultdict(dict)  # S -> provider -> tflops
    for r in recs:
        if (r.get("mode") == "fwd" and r.get("D") == 128
                and r.get("causal") and r.get("tflops") is not None
                and r.get("provider") in ("flash", "jax_flash")
                and r["_file"] == "v5e_d128_causal.jsonl"):
            cells[r["S"]][r["provider"]] = r["tflops"]
    if not cells:
        return []
    lines = [
        "## Causal forward sweep (TFLOPS, D=128 B=4 H=8 bf16)",
        "",
        "| S | flash | jax_flash |",
        "|---|---|---|",
    ]
    for s in sorted(cells):
        row = cells[s]
        f, j = row.get("flash"), row.get("jax_flash")
        fs = f"**{f}**" if f is not None and f >= (j or 0) else str(f)
        lines.append(f"| {s} | {fs} | {j} |")
    lines.append("")
    return lines


def speculate_tables(recs) -> list[str]:
    lines = []
    comp = [r for r in recs if r.get("bench") == "spec_components"]
    if comp:
        lines += [
            "## Speculative decoding (device-time components, 1B target + "
            "150M draft)", "",
            "| k | target step ms | draft step ms | verify chunk ms | "
            "tok/s @α=0 | @α=0.5 | @α=0.8 | @α=1.0 | plain tok/s | "
            "breakeven α |",
            "|---|---|---|---|---|---|---|---|---|---|",
        ]
        for r in sorted(comp, key=lambda r: r["k"]):
            lines.append(
                f"| {r['k']} | {r['t_target_step_ms']} | "
                f"{r['t_draft_step_ms']} | {r['t_verify_chunk_ms']} | "
                f"{r['spec_tok_s_alpha0']} | {r['spec_tok_s_alpha50']} | "
                f"{r['spec_tok_s_alpha80']} | {r['spec_tok_s_alpha100']} | "
                f"{r['plain_decode_tok_s']} | {r['breakeven_alpha']} |")
        lines.append("")
    e2e = [r for r in recs if r.get("bench") == "spec_e2e"]
    if e2e:
        lines += [
            "## Speculative decoding (end-to-end runs)", "",
            "| draft | k | mode | accept rate | greedy exact | "
            "wall tok/s (relay-bound) |",
            "|---|---|---|---|---|---|",
        ]
        for r in sorted(e2e, key=lambda r: (r["draft"], r["k"], r["mode"])):
            lines.append(
                f"| {r['draft']} | {r['k']} | {r['mode']} | "
                f"{r['accept_rate']} | {r.get('greedy_exact', '—')} | "
                f"{r['wall_tok_s_relay_bound']} |")
        lines.append("")
    return lines


def decode_chunk_table(recs) -> list[str]:
    rows = [r for r in recs if r.get("kind") == "decode_chunk_ab"
            and "us" in r]
    if not rows:
        return []
    lines = [
        "## Short-context quantized decode A/B (S=2048)", "",
        "| arm | quant | T | µs/stream | µs/token | GB/s | % HBM peak |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: (r["quant"], r["label"])):
        lines.append(
            f"| {r['label']} | {r['quant']} | {r['t']} | {r['us']} | "
            f"{r['us_per_token']} | {r['hbm_gbps']} | "
            f"{round(100 * r['hbm_frac'], 1)}% |")
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
                         ("serve_prefix", "Serving (shared-prefix cache, "
                                          "wall — relay-noise)"),
                         ("serve_prefix_device",
                          "Serving (shared-prefix admission, device-time)"),
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
    lines += attention_sweep_table(recs)
    lines += decode_table(recs)
    lines += decode_chunk_table(recs)
    lines += misc_tables(recs)
    lines += speculate_tables(recs)
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
