"""Render benchmark sweep results (JSONL from attention_bench.py) as PNGs —
the counterpart of the reference's published images/*.png plots (SURVEY.md
§5 metrics row: "structured benchmark JSON + plotting script").

  python benchmarks/plot.py benchmarks/results/*.jsonl -o benchmarks/results
"""

from __future__ import annotations

import argparse
import json
import pathlib
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Fixed categorical assignment (identity, never cycled): flash=blue, xla=orange,
# naive=aqua — CVD-validated default palette.
SERIES_COLORS = {"flash": "#2a78d6", "xla": "#eb6834", "naive": "#1baf7a",
                 "jax_flash": "#8a5cd6"}
TEXT = "#0b0b0b"
MUTED = "#52514e"


def load(paths):
    recs = []
    for p in paths:
        for line in pathlib.Path(p).read_text().splitlines():
            line = line.strip()
            if line.startswith("{"):
                recs.append(json.loads(line))
    return recs


def plot_group(recs, mode, d, causal, out_dir):
    fig, ax = plt.subplots(figsize=(7, 4.2), dpi=150)
    by_provider = defaultdict(list)
    for r in recs:
        if "provider" not in r or r.get("tflops") is None:
            continue  # probe/crossover rows and nulled failure rows
        if r.get("mode") == mode and r.get("D") == d and (
                r.get("causal") == causal):
            by_provider[r["provider"]].append((r["S"], r["tflops"]))
    if not by_provider:
        plt.close(fig)
        return None
    for provider in ("flash", "xla", "jax_flash", "naive"):  # fixed order
        pts = sorted(by_provider.get(provider, []))
        if not pts:
            continue
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=SERIES_COLORS[provider], linewidth=2,
                marker="o", markersize=5, label=provider)
        # Direct label at the last point (selective, not every point).
        ax.annotate(f"{provider} {ys[-1]:.0f}", (xs[-1], ys[-1]),
                    textcoords="offset points", xytext=(6, 0),
                    color=TEXT, fontsize=9, va="center")
    ax.set_xscale("log", base=2)
    ax.set_xticks(sorted({s for s, _ in sum(by_provider.values(), [])}))
    ax.get_xaxis().set_major_formatter(plt.FuncFormatter(
        lambda v, _: f"{int(v)}"))
    ax.set_xlabel("sequence length", color=MUTED)
    ax.set_ylabel("TFLOPS", color=MUTED)
    ax.set_title(
        f"attention {mode}  D={d}  {'causal' if causal else 'non-causal'}  "
        "(v5e, bf16)", color=TEXT, fontsize=11)
    ax.grid(True, color="#e6e5e0", linewidth=0.6)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(MUTED)
    ax.tick_params(colors=MUTED)
    ax.legend(frameon=False, loc="upper left")
    ax.set_ylim(bottom=0)
    name = f"v5e_d{d}_{'causal' if causal else 'noncausal'}_{mode}.png"
    out = pathlib.Path(out_dir) / name
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--out-dir", default="benchmarks/results")
    args = ap.parse_args()
    recs = load(args.inputs)
    combos = sorted({(r["mode"], r["D"], r["causal"]) for r in recs
                     if {"mode", "D", "causal"} <= r.keys()}, key=str)
    for mode, d, causal in combos:
        out = plot_group(recs, mode, d, causal, args.out_dir)
        if out:
            print(out)


if __name__ == "__main__":
    main()
