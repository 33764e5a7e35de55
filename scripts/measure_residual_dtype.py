"""A/B measurement for the bf16-residual-storage lever (VERDICT r3 item 4).

Runs the bench's airtight chained train-step timing on the real chip with
``lstm_residual_dtype`` off vs "bfloat16", on the flagship (trimodal
adenet_v3, B=1024 f32-matmul — the HBM-bound configuration per
docs/DESIGN.md) and the peephole flagship (adenet_v2_1, B=256 and B=1024).
Prints one JSON line per cell; the measured deltas land in docs/DESIGN.md
(kept only if they win — otherwise recorded as a negative result like
int8/batch-8192).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    iters = 10
    cells = [
        ("flagship_b1024_f32mm", lambda resd: bench.measure_train(
            1024, iters, matmul_dtype=None, residual_dtype=resd)),
        ("flagship_b256_bf16mm", lambda resd: bench.measure_train(
            256, iters, matmul_dtype="bfloat16", residual_dtype=resd)),
        ("peep_b256", lambda resd: bench.measure_train_peep(
            256, iters, residual_dtype=resd)),
        ("peep_b1024", lambda resd: bench.measure_train_peep(
            1024, iters, residual_dtype=resd)),
    ]
    for name, fn in cells:
        base, _ = fn(None)
        bf16, _ = fn("bfloat16")
        print(json.dumps({
            "cell": name,
            "f32_residuals_utt_per_sec": round(base, 1),
            "bf16_residuals_utt_per_sec": round(bf16, 1),
            "speedup": round(bf16 / base, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
