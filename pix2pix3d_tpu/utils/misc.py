"""Small framework utilities (the TPU-relevant subset of the reference's
`torch_utils/misc.py` — most of that file is torch-specific plumbing that has
no JAX analog: gradfix toggles, DDP sync, fake-tensor summaries)."""

from __future__ import annotations

import jax


def assert_shape(x, ref_shape):
    """Shape assertion with None wildcards (ref `misc.py:84-100`)."""
    assert x.ndim == len(ref_shape), \
        f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}"
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is None:
            continue
        assert size == ref_size, \
            f"Wrong size for dimension {idx}: got {size}, expected {ref_size}"


def tree_paths(tree, prefix=()):
    """Yield (path_tuple, leaf) for a nested-dict pytree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def tree_size(tree):
    return sum(leaf.size for _, leaf in tree_paths(tree))


def format_time(seconds):
    """Human-readable duration (ref `dnnlib/util.py:141`-style)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s % 3600) // 60:02d}m"
    return f"{s // 86400}d {(s % 86400) // 3600:02d}h"
