"""Run reporting (reference ``train.py:324-353``): aggregate OA/AA/Kappa and
per-class accuracy (mean ± std over repeated runs) into a CSV."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from cmlpl_tpu.eval.metrics import Accuracy


def results_dataframe(runs: Sequence[Accuracy], prefix: str = ""):
    """Build the reference's result table (train.py:342-343) for one
    network's repeated runs."""
    import pandas as pd

    oa = np.array([r.oa for r in runs]) * 100
    aa = np.array([r.aa for r in runs]) * 100
    kappa = np.array([r.kappa for r in runs]) * 100
    producer = np.stack([r.producer for r in runs]) * 100
    return pd.DataFrame({
        f"{prefix}OA": np.mean(oa),
        f"{prefix}OA_std": np.std(oa),
        f"{prefix}AA": np.mean(aa),
        f"{prefix}AA_std": np.std(aa),
        f"{prefix}KAPPA": np.mean(kappa),
        f"{prefix}KAPPA_std": np.std(kappa),
        f"{prefix}ALL_ACC": np.mean(producer, axis=0),
        f"{prefix}ALL_ACC_std": np.std(producer, axis=0),
    })


def save_report(path: str, runs_b: Sequence[Accuracy],
                runs_e: Sequence[Accuracy] | None = None) -> None:
    import pandas as pd

    frames = [results_dataframe(runs_b)]
    if runs_e:
        frames.append(results_dataframe(runs_e, prefix="net_e_"))
    pd.concat(frames, axis=1).to_csv(path, index=False, sep=",")
