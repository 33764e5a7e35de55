"""A/B training-step throughput across the batch ladder on the real chip.

Drives bench.measure_train / measure_train_peep (airtight param-carry
chained timing) at candidate batch sizes to pick the full bench's train
ladder.  Each (batch, dtype) point costs one fresh remote compile.

Usage: python scripts/measure_train_batch.py [B ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plain = "--peep-only" not in sys.argv
    do_peep = "--plain-only" not in sys.argv
    batches = [int(a) for a in argv] or [1024, 2048, 4096]
    iters = 10
    def tfs(flops_step, b, tput):
        # flops is per STEP (whole batch); tput is per utterance
        return (f"({flops_step / b * tput / 1e12:.1f} TF/s)"
                if flops_step else "(flops n/a)")

    for b in batches if do_plain else []:
        try:
            tput, flops = bench.measure_train(b, iters, matmul_dtype=None)
            print(f"train    B={b:5d} f32 : {tput:10.1f} utt/s "
                  f"{tfs(flops, b, tput)}", flush=True)
        except Exception as e:  # noqa: BLE001 — HBM OOM at big B is data
            print(f"train    B={b:5d} f32 : FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
    for b in batches if do_peep else []:
        try:
            tput, flops = bench.measure_train_peep(b, iters)
            print(f"peeptrain B={b:5d}    : {tput:10.1f} utt/s "
                  f"{tfs(flops, b, tput)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"peeptrain B={b:5d}    : FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
