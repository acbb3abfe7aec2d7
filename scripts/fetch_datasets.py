"""Fetch the public HSI cubes the reference trains on, into ./dataset.

VERDICT r1 item 1: the OA-parity claim needs the real PaviaU cube.  The
cubes are standard public downloads (the EHU/GIC hyperspectral scenes
page); this script downloads them, converts the ones whose public layout
differs from what the reference's loaders expect
(/root/reference/tools/hyper_tools.py:250-277), and verifies every file by
loading it through the framework's own loader and checking the registry
dims.

Usage:
  python scripts/fetch_datasets.py                 # fetch + verify all
  python scripts/fetch_datasets.py --only paviau   # one dataset
  python scripts/fetch_datasets.py --verify        # verify existing files

Houston (dataID 3) is the IEEE GRSS DFC2013 contest scene: it requires
registration at dase.grss-ieee.org and has no stable anonymous URL.  Place
``Houston.mat`` (key ``Houston``) and ``Houston_gt.mat`` (key
``Houston_gt``) in the data root manually; ``--verify`` will check them.

In a zero-egress container every download fails with a clear message; the
verify path (and everything downstream: splits, training, OA parity) is
exercised by tests on synthetic scenes, so the harness is ready the moment
the files exist.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

EHU = "https://www.ehu.eus/ccwintco/uploads"

# (dataset key) -> list of (url | None, destination file, convert spec)
# convert spec: None = save as downloaded; (src_key, dst_key) = re-save the
# array under the dict key the reference's loader expects.
FETCH_PLAN = {
    "paviau": [
        (f"{EHU}/e/ee/PaviaU.mat", "PaviaU.mat", None),
        (f"{EHU}/5/50/PaviaU_gt.mat", "PaviaU_gt.mat", None),
    ],
    "salinas": [
        # public file/key: Salinas_corrected.mat / salinas_corrected;
        # reference expects salinas.mat / HSI_original
        # (hyper_tools.py:258-260)
        (f"{EHU}/a/a3/Salinas_corrected.mat", "salinas.mat",
         ("salinas_corrected", "HSI_original")),
        # public key salinas_gt; reference expects Data_gt
        (f"{EHU}/f/fa/Salinas_gt.mat", "salinas_gt.mat",
         ("salinas_gt", "Data_gt")),
    ],
    "houston": [
        (None, "Houston.mat", None),       # DFC2013: manual download
        (None, "Houston_gt.mat", None),
    ],
    "indian_pines": [
        # public file is MATLAB v5 with the key the reference expects;
        # the loader (data/io.py) handles v5-vs-v7.3 transparently
        (f"{EHU}/6/67/Indian_pines_corrected.mat",
         "indian_pines_corrected.mat", None),
        (f"{EHU}/c/c4/Indian_pines_gt.mat", "indian_pines_gt.mat", None),
    ],
}

DATA_IDS = {"paviau": 1, "salinas": 2, "houston": 3, "indian_pines": 4}


def fetch_one(url: str, dest: str, convert) -> bool:
    tmp = dest + ".part"
    try:
        print(f"fetching {url} -> {dest}")
        urllib.request.urlretrieve(url, tmp)
    except (urllib.error.URLError, OSError) as e:
        print(f"  DOWNLOAD FAILED ({e}); fetch manually:\n"
              f"    curl -L -o {dest} {url!r}")
        if os.path.exists(tmp):
            os.remove(tmp)
        return False
    if convert is not None:
        import scipy.io as sio

        src_key, dst_key = convert
        arr = sio.loadmat(tmp)[src_key]
        sio.savemat(dest, {dst_key: arr})
        os.remove(tmp)
        print(f"  converted key {src_key!r} -> {dst_key!r}")
    else:
        os.replace(tmp, dest)
    return True


def verify(name: str, root: str) -> bool:
    """Load through the framework's own loader and check registry dims."""
    from cmlpl_tpu.registry import get_dataset

    spec = get_dataset(DATA_IDS[name])
    paths = [os.path.join(root, spec.cube_file),
             os.path.join(root, spec.gt_file)]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        print(f"{spec.name}: MISSING {missing}")
        return False
    from cmlpl_tpu.data.io import load_scene

    X, Y = load_scene(spec, root)
    ok = (X.shape == (spec.rows, spec.cols, spec.num_bands)
          and Y.shape == (spec.rows, spec.cols)
          and int(Y.max()) == spec.num_classes)
    print(f"{spec.name}: cube {X.shape} gt {Y.shape} "
          f"classes {int(Y.max())} -> {'OK' if ok else 'SHAPE MISMATCH'}")
    return ok


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="./dataset")
    p.add_argument("--only", choices=sorted(FETCH_PLAN), default=None)
    p.add_argument("--verify", action="store_true",
                   help="skip downloads; verify files already present")
    args = p.parse_args(argv)

    os.makedirs(args.data_root, exist_ok=True)
    names = [args.only] if args.only else sorted(FETCH_PLAN)
    ok = True
    for name in names:
        if not args.verify:
            for url, fname, convert in FETCH_PLAN[name]:
                dest = os.path.join(args.data_root, fname)
                if os.path.exists(dest):
                    print(f"{dest}: already present")
                    continue
                if url is None:
                    print(f"{dest}: no anonymous URL (DFC2013 "
                          "registration required; see module docstring)")
                    continue
                fetch_one(url, dest, convert)
        ok = verify(name, args.data_root) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
