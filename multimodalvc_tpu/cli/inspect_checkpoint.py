"""Inspect checkpoint contents: key prefixes, shapes, parameter counts.

Reference analog: inspect_checkpoint.py at the reference root (checks which
state-dict keys a product checkpoint covers).  Works on torch .pt zips (via
the torch-free pt_loader), orbax directories, and numpy-fallback dirs.
"""
from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def _flat_items(path: str):
    if path.endswith((".pt", ".pth")):
        from ..runtime.pt_loader import flatten_state_dict, load_pt

        raw = load_pt(path)
        return sorted(flatten_state_dict(raw).items())
    if os.path.isdir(path):
        npz = os.path.join(path, "arrays.npz")
        if os.path.exists(npz):
            data = np.load(npz)
            return sorted((k, data[k]) for k in data.files)
        try:
            import orbax.checkpoint as ocp

            tree = ocp.PyTreeCheckpointer().restore(path)
            import jax

            return sorted(
                ("/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp), leaf)
                for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
            )
        except Exception as e:
            raise SystemExit(f"cannot read {path}: {e}")
    raise SystemExit(f"unsupported checkpoint path {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help=".pt file, orbax dir, or numpy ckpt dir")
    parser.add_argument("--depth", type=int, default=2, help="prefix grouping depth")
    parser.add_argument("--keys", action="store_true", help="print every key")
    args = parser.parse_args()

    items = _flat_items(args.path)
    groups = defaultdict(lambda: [0, 0])  # prefix -> [n_keys, n_params]
    total = 0
    for key, val in items:
        arr = np.asarray(val) if hasattr(val, "shape") else np.asarray([])
        prefix = ".".join(str(key).replace("/", ".").split(".")[: args.depth])
        groups[prefix][0] += 1
        groups[prefix][1] += int(arr.size)
        total += int(arr.size)
        if args.keys:
            print(f"{key}\t{getattr(arr, 'shape', ())}\t{getattr(arr, 'dtype', '')}")
    print(f"{len(items)} keys, {total / 1e6:.2f}M params — prefixes at depth {args.depth}:")
    for prefix in sorted(groups):
        n, p = groups[prefix]
        print(f"  {prefix:50s} {n:5d} keys {p / 1e6:10.2f}M")


if __name__ == "__main__":
    main()
