"""Plot a metrics.jsonl stream to a PNG of loss curves.

Usage: python -m psnerf_tpu.cli.plot_metrics <metrics.jsonl> [out.png]
Replaces the reference's TensorBoard scalar views and matplotlib curve plots
(preprocessing/utils/logger.py:161-190).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    path = argv[0]
    out = argv[1] if len(argv) > 1 else path.replace(".jsonl", ".png")

    series = defaultdict(lambda: ([], []))
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            it = rec.pop("it")
            rec.pop("wall", None)
            for k, v in rec.items():
                series[k][0].append(it)
                series[k][1].append(v)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted(series)
    n = len(keys)
    cols = min(3, max(1, n))
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows),
                             squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        xs, ys = series[k]
        ax.plot(xs, ys, lw=0.8)
        ax.set_title(k, fontsize=9)
        ax.grid(alpha=0.3)
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
