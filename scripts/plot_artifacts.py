#!/usr/bin/env python
"""Render the committed JSON artifacts as matplotlib figures (PDF).

The reference emits matplotlib plots from its model-validation and
parameter-fitting suites (reference
controller/dynamic_partition/hnsw/analysis/analysis_hnsw_recall.py:440-479
fit PDFs; controller/dynamic_partition/hnsw/validate/plot_*.py). This is
the same surface for the TPU rebuild: every figure is derived from a
committed results/*.json artifact, so the plots are reproducible from the
repo alone (no TPU needed).

Usage:  python scripts/plot_artifacts.py [--out results/plots]

Figures (each skipped silently if its artifact is absent):
  model_validation.pdf        predicted-vs-measured HNSW recall (grid cells)
  ivf_coverage_validation.pdf IVF coverage-model recall vs nprobe
  strategy_compare.pdf        5-strategy QPS vs the reference CPU numbers
  qdtree_margin.pdf           qd-tree routing margin sweep (recall / QPS)
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# validated reference palette (dataviz skill references/palette.md, light mode)
C1, C2, C3, C4, C5 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"
INK, INK2, GRID = "#0b0b0b", "#52514e", "#e6e5e2"
SURFACE = "#fcfcfb"

plt.rcParams.update({
    "figure.facecolor": SURFACE,
    "axes.facecolor": SURFACE,
    "axes.edgecolor": INK2,
    "axes.labelcolor": INK,
    "text.color": INK,
    "xtick.color": INK2,
    "ytick.color": INK2,
    "axes.grid": True,
    "grid.color": GRID,
    "grid.linewidth": 0.6,
    "axes.spines.top": False,
    "axes.spines.right": False,
    "font.size": 9,
    "legend.frameon": False,
})

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results")


def _load(name):
    path = os.path.join(RESULTS, name)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def plot_model_validation(out_dir: str) -> str | None:
    """Predicted vs measured recall over the (n, sel, ef) grid — the analog
    of the reference's modelrecall_vs_realrecall plots. Scatter shows BOTH
    families: the reference piecewise form and the shipping TPU family
    (models/cost.py) fitted on the same grid."""
    art = _load("model_validation_tpu_family.json")
    ref_art = _load("model_validation.json")
    if art is None:
        art, ref_art = ref_art, None
    if art is None:
        return None
    cells = art["cells"]
    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(8.4, 3.4))

    # left: identity scatter, one hue per model family (identity job)
    if ref_art is not None:
        for c in ref_art["cells"]:
            ax.plot(c["measured_recall"], c["predicted_recall"], "o",
                    color="#b9b7b0", markersize=4, alpha=0.7,
                    markeredgecolor="none")
    for c in cells:
        ax.plot(c["measured_recall"], c["predicted_recall"], "o",
                color=C1, markersize=4, alpha=0.75, markeredgecolor="none")
    ax.plot([0, 1], [0, 1], "-", color=INK2, linewidth=1)
    ax.set_xlabel("measured recall")
    ax.set_ylabel("predicted recall")
    title = f"Recall model — TPU family MAE {art['recall_mae']:.3f}"
    if ref_art is not None:
        title += f" (gray: reference family, {ref_art['recall_mae']:.3f})"
    ax.set_title(title, fontsize=8.5, color=INK)
    ax.set_xlim(0, 1.02)
    ax.set_ylim(0, 1.02)

    # right: recall-vs-ef curves for the largest n, colored by selectivity
    # (categorical identity, fixed slot order)
    n_max = max(c["n"] for c in cells)
    big = sorted([c for c in cells if c["n"] == n_max], key=lambda c: c["sel"])
    colors = [C1, C2, C3, C4, C5]
    for c, col in zip(big[:5], colors):
        ax2.plot(c["efs"], c["measured_recall"], "o", color=col, markersize=4,
                 markeredgecolor="none")
        ax2.plot(c["efs"], c["predicted_recall"], "-", color=col, linewidth=2,
                 label=f"sel {c['sel']:.3f}")
    ax2.set_xscale("log")
    ax2.set_xlabel("ef_search")
    ax2.set_ylabel("recall")
    ax2.set_title(f"n={n_max:,}: dots measured, lines model", fontsize=9)
    ax2.legend(fontsize=7, loc="lower right")
    fig.tight_layout()
    path = os.path.join(out_dir, "model_validation.pdf")
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_ivf_coverage(out_dir: str) -> str | None:
    art = _load("ivf_coverage_validation_1m.json")
    if art is None:
        return None
    cells = sorted(art["cells"], key=lambda c: (c["n"], c["sel"]))
    fig, ax = plt.subplots(figsize=(5.2, 3.4))
    colors = [C1, C2, C3, C4, C5, "#008300", "#4a3aa7", "#52514e"]
    for c, col in zip(cells[:8], colors):
        lbl = f"n={c['n']:,} sel={c['sel']:.3f}"
        ax.plot(c["nprobes"], c["measured_recall"], "o", color=col,
                markersize=4, markeredgecolor="none")
        ax.plot(c["nprobes"], c["predicted_recall"], "-", color=col,
                linewidth=1.8, label=lbl)
    ax.set_xscale("log")
    ax.set_xlabel("nprobe")
    ax.set_ylabel("recall")
    ax.set_title(
        f"IVF coverage recall model — held-out MAE {art['heldout_recall_mae']:.4f}"
        f" (HNSW-family bar {art['hnsw_family_reference_mae']:.3f})",
        fontsize=8)
    ax.legend(fontsize=6, ncol=2, loc="lower right")
    fig.tight_layout()
    path = os.path.join(out_dir, "ivf_coverage_validation.pdf")
    fig.savefig(path)
    plt.close(fig)
    return path


# best committed reference CPU numbers per strategy (BASELINE.md implied QPS;
# RLS -> physical postfilter, ROLE -> physical role partition, USER has no
# direct C++ twin (role is the closest), dynamic -> physical dynamic)
REF_QPS = {"rls": 630.0, "role": 8470.0, "user": 8470.0,
           "dynamic": 3268.0, "qdtree": 90.9}
REF_NOTE = {"rls": "physical postfilter ef=500",
            "role": "physical role partition ef=30",
            "user": "(role partition twin)",
            "dynamic": "physical dynamic ef=70",
            "qdtree": "HQI qd-tree efs=10 (driver op point)"}


def plot_strategy_compare(out_dir: str) -> str | None:
    art = _load("strategy_compare_1m_r4.json") or _load(
        "strategy_compare_1m_r3.json")
    if art is None:
        return None
    names = [k for k in ("rls", "role", "user", "dynamic", "qdtree") if k in art]
    fig, ax = plt.subplots(figsize=(6.4, 3.2))
    y = range(len(names))
    ours = [art[n]["qps"] for n in names]
    ref = [REF_QPS.get(n) for n in names]
    ax.barh([i + 0.19 for i in y], ours, height=0.34, color=C1,
            label="this framework (TPU v5e, 1 chip)")
    ax.barh([i - 0.19 for i in y], ref, height=0.34, color="#b9b7b0",
            label="reference (CPU, best committed)")
    for i, n in enumerate(names):
        ax.text(ours[i] * 1.06, i + 0.19, f"{ours[i]:,.0f}  r={art[n]['recall_at_10']:.3f}",
                va="center", fontsize=7, color=INK)
        ax.text(ref[i] * 1.06, i - 0.19, f"{ref[i]:,.0f}", va="center",
                fontsize=7, color=INK2)
    ax.set_xscale("log")
    ax.set_yticks(list(y))
    ax.set_yticklabels([n.upper() for n in names])
    ax.set_xlabel("QPS (log scale) — 1M vectors, RBAC-filtered, top-10")
    ax.set_title("Strategy compare at shipping defaults", fontsize=9)
    ax.legend(fontsize=7, loc="lower right")
    ax.grid(axis="y", visible=False)
    fig.tight_layout()
    path = os.path.join(out_dir, "strategy_compare.pdf")
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_qdtree_margin(out_dir: str) -> str | None:
    art = _load("qdtree_margin_sweep_1m.json")
    if art is None:
        return None
    margins = sorted(art.keys(), key=float)
    rec = [art[m]["recall_at_10"] for m in margins]
    qps = [art[m]["qps"] for m in margins]
    # two measures of different scale -> two stacked charts, one axis each
    fig, (ax, ax2) = plt.subplots(2, 1, figsize=(4.6, 4.2), sharex=True)
    xs = [float(m) for m in margins]
    ax.plot(xs, rec, "-o", color=C1, linewidth=2, markersize=5,
            markeredgecolor="none")
    ax.set_ylabel("recall@10")
    ax.set_title("qd-tree centroid-routing margin sweep (1M)", fontsize=9)
    ax2.plot(xs, qps, "-o", color=C2, linewidth=2, markersize=5,
             markeredgecolor="none")
    ax2.set_ylabel("QPS")
    ax2.set_xlabel("prune margin (fraction of best centroid distance)")
    fig.tight_layout()
    path = os.path.join(out_dir, "qdtree_margin.pdf")
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_serving_load(out: str):
    """Latency/throughput operating curve of the BatchingServer
    (results/serving_load_1m.json)."""
    data = _load("serving_load_1m.json")
    if data is None:
        return None
    levels = data["levels"]
    c = [r["clients"] for r in levels]
    qps = [r["qps"] for r in levels]
    p50 = [r["p50_ms"] for r in levels]
    p95 = [r["p95_ms"] for r in levels]

    fig, ax = plt.subplots(figsize=(5.2, 3.2))
    ax.plot(c, qps, marker="o", color=C1, label="throughput (QPS)")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("closed-loop clients")
    ax.set_ylabel("QPS", color=C1)
    ax2 = ax.twinx()
    ax2.plot(c, p50, marker="s", color=C2, label="p50 latency")
    ax2.plot(c, p95, marker="^", color=C2, alpha=0.45, label="p95 latency")
    ax2.set_ylabel("latency (ms)", color=C2)
    ax2.grid(False)
    ax2.spines["top"].set_visible(False)
    lines = ax.get_lines() + ax2.get_lines()
    ax.legend(lines, [ln.get_label() for ln in lines], loc="upper left",
              fontsize=8)
    ax.set_title(f"serving front-end, {data['n']:,} rows int8 top-{data['k']}"
                 f" ({data['window_s']:.0f}s windows)", fontsize=9)
    path = os.path.join(out, "serving_load.pdf")
    fig.tight_layout(); fig.savefig(path); plt.close(fig)
    return path


def plot_online_insert(out: str):
    """Online-insert throughput + recall arms
    (results/online_insert_scale.json)."""
    data = _load("online_insert_scale.json")
    if data is None:
        return None
    h, v = data["hnsw"], data["ivf"]
    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(7.2, 3.0))

    bars = [
        ("IVF\ninsert", v["insert_rows_per_s"], C3),
        ("HNSW\ninsert", h["insert_rows_per_s"], C1),
        ("HNSW insert\n+ refine", h.get("insert_plus_refine_rows_per_s", 0),
         C2),
        ("HNSW\nbuild", data["n_old"] / h["build_s"], INK2),
    ]
    xs = range(len(bars))
    ax.bar(xs, [b[1] for b in bars], color=[b[2] for b in bars], width=0.62)
    ax.set_xticks(list(xs), [b[0] for b in bars], fontsize=8)
    ax.set_ylabel("rows / s")
    ax.set_title(f"{data['n_insert']:,}-row batch into a live "
                 f"{data['n_old']:,}-row index", fontsize=9)

    arms = [
        ("built graph\n(pre-insert)", h["recall_before"], INK2),
        ("after insert", h["recall_inserted_region"], C1),
        ("after refine", h.get("recall_inserted_region_after_refine", 0), C2),
        ("IVF", v["recall_inserted_region"], C3),
    ]
    xs2 = range(len(arms))
    ax2.bar(xs2, [a[1] for a in arms], color=[a[2] for a in arms], width=0.62)
    ax2.set_xticks(list(xs2), [a[0] for a in arms], fontsize=8)
    ax2.set_ylim(0, 1.05)
    ax2.axhline(h["recall_before"], color=INK2, lw=0.8, ls="--")
    ax2.set_ylabel(f"recall@{data['k']} (inserted region)")
    ax2.set_title("inserted rows reachable?", fontsize=9)
    path = os.path.join(out, "online_insert.pdf")
    fig.tight_layout(); fig.savefig(path); plt.close(fig)
    return path


def plot_graph_crossover(out_dir: str) -> str | None:
    art = _load("graph_crossover.json")
    if art is None:
        return None
    cases = art["cases"]
    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(8.4, 3.2))
    # left: QPS vs n at sel=1.0, d=128 — the scale axis
    sweep = [c for c in cases if c["d"] == 128 and c["selectivity"] == 1.0]
    sweep.sort(key=lambda c: c["n"])
    ns = [c["n"] for c in sweep]
    ax.plot(ns, [c["flat_qps"] for c in sweep], "o-", color=C1,
            label="fused int8 flat scan")
    ax.plot(ns, [c["graph_qps"] for c in sweep], "s-", color=C2,
            label="slab-batched HNSW (best ef >= 0.95 recall)")
    ax.set_xscale("log"); ax.set_yscale("log")
    ax.set_xlabel("rows (d=128, within-index selectivity 1.0)")
    ax.set_ylabel("QPS")
    ax.set_title("graph vs flat: scale axis", fontsize=9)
    ax.legend(fontsize=7)
    # right: QPS vs selectivity at 1M x 128
    ssw = [c for c in cases if c["d"] == 128 and c["n"] == 1_000_000]
    ssw.sort(key=lambda c: c["selectivity"])
    if ssw:
        sels = [c["selectivity"] for c in ssw]
        ax2.plot(sels, [c["flat_qps"] for c in ssw], "o-", color=C1)
        ax2.plot(sels, [c["graph_qps"] for c in ssw], "s-", color=C2)
        ax2.set_xscale("log"); ax2.set_yscale("log")
        ax2.set_xlabel("within-index selectivity (1M x 128)")
        ax2.set_title("graph vs flat: selectivity axis", fontsize=9)
    fig.tight_layout()
    path = os.path.join(out_dir, "graph_crossover.pdf")
    fig.savefig(path); plt.close(fig)
    return path


def plot_cohere_legs(out_dir: str) -> str | None:
    art = _load("cohere_768d_1m_r4.json")
    if art is None:
        return None
    legs = art["legs"]
    names = list(legs)
    fig, ax = plt.subplots(figsize=(6.0, 3.0))
    for i, n in enumerate(names):
        leg = legs[n]
        ax.scatter(leg["qps"], leg["recall_at_100"], s=46,
                   color=[C1, C3, C4, C2][i % 4], zorder=3)
        ax.annotate(n, (leg["qps"], leg["recall_at_100"]),
                    textcoords="offset points", xytext=(6, -3), fontsize=7)
    ax.axhline(0.99, color=INK2, lw=0.8, ls="--")
    ax.text(ax.get_xlim()[0], 0.9903, "0.99 target", fontsize=7, color=INK2)
    ax.set_xlabel("QPS (1M x 768 cosine, top-100, 16k queries)")
    ax.set_ylabel("recall@100")
    ax.set_title("768-d rerank-query-source legs (round 4)", fontsize=9)
    fig.tight_layout()
    path = os.path.join(out_dir, "cohere_768d_legs.pdf")
    fig.savefig(path); plt.close(fig)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/plots")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    made = [p for p in (
        plot_model_validation(args.out),
        plot_ivf_coverage(args.out),
        plot_strategy_compare(args.out),
        plot_qdtree_margin(args.out),
        plot_serving_load(args.out),
        plot_online_insert(args.out),
        plot_graph_crossover(args.out),
        plot_cohere_legs(args.out),
    ) if p]
    for p in made:
        print(p)
    if not made:
        print("no artifacts found under results/")


if __name__ == "__main__":
    main()
