"""A/B lstm_remat as a SPEED lever on the training step (real chip).

NEGATIVE RESULT (r4, measured on v5e, B=2048 flagship shapes):

    train     B=2048 remat=0: 28647 utt/s   remat=1: 24086 utt/s  (0.84x)
    peeptrain B=2048 remat=0: 45006 utt/s   remat=1: 40259 utt/s  (0.89x)

The naive arithmetic ("skip the ~237 MB gate-stack HBM write+read, pay
~47 GFLOP of rebuild") double-counts the saving: the rebuilt gates must
MATERIALIZE in HBM anyway as the input of the (opaque) Pallas backward
chain, so remat trades one write for one write plus the rebuild matmuls —
and the remat forward takes the XLA scan path (the Pallas train kernel
always emits gates), giving up the faster kernel forward too.  A fused
backward kernel that rebuilds gates per grid step in VMEM (streaming x
(D=150) + hids (H) instead of gates (4H)) could in principle cut the
chain's stream bytes ~2x, but the chain is only a few ms of a ~70 ms
step — not worth the kernel complexity.  lstm_remat stays what it is
documented as: a memory lever (~3x less residual memory per layer).

Usage: python scripts/measure_remat_speed.py [B ...] [--plain-only|--peep-only]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plain = "--peep-only" not in sys.argv
    do_peep = "--plain-only" not in sys.argv
    batches = [int(a) for a in argv] or [2048]
    iters = 10
    for b in batches if do_plain else []:
        for remat in (False, True):
            tput, _ = bench.measure_train(b, iters, matmul_dtype=None,
                                          remat=remat)
            print(f"train     B={b:5d} remat={int(remat)}: {tput:10.1f} utt/s",
                  flush=True)
    for b in batches if do_peep else []:
        for remat in (False, True):
            tput, _ = bench.measure_train_peep(b, iters, remat=remat)
            print(f"peeptrain B={b:5d} remat={int(remat)}: {tput:10.1f} utt/s",
                  flush=True)


if __name__ == "__main__":
    main()
