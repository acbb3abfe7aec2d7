"""Subprocess worker: the FULL CMLPL training CLI under a 2-process pod.

Runs ``cli.train.main`` with --multihost: the same command a pod launch
script would use on every host.  Training runs on the global 8-device
mesh; eval runs on the global mesh too (scene tiles split across hosts,
strips allgathered); only process 0 writes the svg/csv artifacts.
Prints the final OA for the parent to compare across processes.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    algo = sys.argv[1] if len(sys.argv) > 1 else "cmlpl"
    if algo == "cps":
        from cmlpl_tpu.cli.train_cps import main as train_main
    else:
        from cmlpl_tpu.cli.train import main as train_main

    common = [
        "--dataID", "0", "--n_PC", "8",
        "--labeled_batch_size", "16", "--unlabeled_batch_size", "16",
        "--num_unlabel", "64", "--val_batch_size", "128",
        "--dropout", "0.0", "--print_per_batches", "0",
        "--checkpoint_dir", "./ckpt", "--multihost"]
    if algo == "cmlpl":
        # exercise the GSPMD-sharded dense eval on the pod mesh (cps
        # keeps the tiled global-mesh eval path covered)
        common += ["--eval_gather", "dense"]
    acc_b, acc_e = train_main(common + ["--num_epochs", "2"])
    # pod-safe --resume: restore the 2-epoch checkpoint on every process,
    # re-place it on the global mesh (core.mesh.place_state), and train
    # one more epoch through the jitted per-epoch path
    racc_b, racc_e = train_main(common + ["--num_epochs", "3", "--resume"])
    print("RESULT " + json.dumps({
        "algo": algo,
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "oa_b": round(acc_b.oa, 6), "oa_e": round(acc_e.oa, 6),
        "resumed_oa_b": round(racc_b.oa, 6),
        "resumed_oa_e": round(racc_e.oa, 6)}),
        flush=True)


if __name__ == "__main__":
    main()
