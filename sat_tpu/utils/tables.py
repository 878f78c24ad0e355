"""Parameter-count reporting (reference utils.py:109-119), without the
prettytable dependency: a minimal ASCII table with the same two columns."""

from __future__ import annotations

import numpy as np
import jax


def _render_table(rows, headers):
    widths = [max(len(str(r[i])) for r in rows + [headers]) for i in range(len(headers))]
    def line(ch="-", joint="+"):
        return joint + joint.join(ch * (w + 2) for w in widths) + joint
    def fmt(row):
        return "| " + " | ".join(str(c).ljust(w) for c, w in zip(row, widths)) + " |"
    out = [line(), fmt(headers), line()]
    out += [fmt(r) for r in rows]
    out.append(line())
    return "\n".join(out)


def count_parameters(params, trainable_filter=None, print_fn=print) -> int:
    """Print a per-leaf parameter table and the trainable total.

    `params` is any pytree; `trainable_filter(path) -> bool` excludes frozen
    leaves (the reference skips params with requires_grad=False,
    utils.py:113). Returns the total trainable parameter count.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows, total = [], 0
    for path, leaf in flat:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if trainable_filter is not None and not trainable_filter(name):
            continue
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        rows.append((name, n))
        total += n
    print_fn(_render_table(rows, ("Modules", "Parameters")))
    print_fn(f"Total Trainable Params: {total}")
    return total
