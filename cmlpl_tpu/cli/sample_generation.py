"""Data preparation CLI (reference ``sample_generation.py``).

Writes the split arrays (byte-identical to the reference seeds) plus the
z-scored spectra and labels.  The reference also materialises the full
patch tensor ``XP.npy`` (~18.5 GiB for PaviaU, ``sample_generation.py:68``);
the TPU pipeline gathers patches on the fly, so that file is only written
with ``--materialize_patches`` (for interop with the reference loaders).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cmlpl_tpu.data.io import load_scene
from cmlpl_tpu.data.patches import patch_pad_width
from cmlpl_tpu.data.prep import feature_normalize, pca_norm
from cmlpl_tpu.data.splits import generate_splits
from cmlpl_tpu.registry import get_dataset


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataID", type=str, default="1")
    p.add_argument("--num_label", type=int, default=5)
    p.add_argument("--w", type=int, default=20)
    p.add_argument("--n_PC", type=int, default=60)
    p.add_argument("--data_root", type=str, default="./dataset")
    p.add_argument("--scene_npz", type=str, default=None,
                   help="load the raw scene from this .npz ('cube'/'gt' "
                        "arrays) instead of the registry .mat files")
    p.add_argument("--materialize_patches", action="store_true",
                   help="also write the reference's XP.npy patch tensor")
    args = p.parse_args(args)

    spec = get_dataset(args.dataID)
    if args.scene_npz:
        with np.load(args.scene_npz) as z:
            cube, gt = z["cube"], z["gt"]
    else:
        cube, gt = load_scene(spec, args.data_root)
    rows, cols, bands = cube.shape
    flat = cube.reshape(rows * cols, bands)

    x_pca = feature_normalize(pca_norm(flat, args.n_PC), 1)
    X = feature_normalize(flat, 1).astype(np.float32)
    Y = np.asarray(gt).reshape(-1)

    out = os.path.join(args.data_root, spec.name)
    os.makedirs(out, exist_ok=True)

    splits = generate_splits(Y, num_label=args.num_label)
    np.save(os.path.join(out, "X.npy"), X)
    np.save(os.path.join(out, "Y.npy"), Y)
    np.save(os.path.join(out, "train_array.npy"), splits.train)
    np.save(os.path.join(out, "test_array.npy"), splits.test)
    np.save(os.path.join(out, "unlabel_array.npy"), splits.unlabeled)

    if args.materialize_patches:
        from cmlpl_tpu.native import (
            extract_patches_native,
            pad_symmetric_native,
        )

        hw = patch_pad_width(args.w)
        padded = pad_symmetric_native(
            x_pca.reshape(rows, cols, args.n_PC).astype(np.float32), hw)
        XP = extract_patches_native(padded, rows, cols, args.w,
                                    layout="nchw")
        np.save(os.path.join(out, "XP.npy"), XP)

    print(f"wrote splits for {spec.name} to {out}: "
          f"train={splits.train.shape[0]} test={splits.test.shape[0]} "
          f"unlabeled={splits.unlabeled.shape[0]}")


if __name__ == "__main__":
    main()
