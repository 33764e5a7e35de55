"""Delta-feature ablation: train the same model with and without DeltaLayers
and compare classification rates.

Parity with avletters/evaluate_delta_features.py's role: quantify what the
in-graph delta/acceleration features buy.  Runs the generic nstream trainer
twice on one config — once as-is, once with every stream's delta disabled —
and prints a side-by-side report.

Usage:
    python -m ip_avsr_tpu.cli.evaluate_delta_features \
        --config configs/synthetic_1stream.ini --synthetic 60
"""

from __future__ import annotations

import argparse

from ip_avsr_tpu.cli import nstream


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--num_epoch", type=int)
    ap.add_argument("--split", default="subjects", choices=["subjects", "itervec"])
    args = ap.parse_args(argv)

    import configparser
    import tempfile

    base_args = ["--config", args.config, "--split", args.split]
    if args.synthetic:
        base_args += ["--synthetic", str(args.synthetic)]
    if args.num_epoch:
        base_args += ["--num_epoch", str(args.num_epoch)]

    print("=== run 1/2: with delta features ===")
    with_delta = nstream.main(list(base_args))

    # rewrite the config with use_delta = false on every stream
    cp = configparser.ConfigParser()
    cp.read(args.config)
    i = 1
    while cp.has_section(f"stream{i}"):
        cp.set(f"stream{i}", "use_delta", "false")
        i += 1
    with tempfile.NamedTemporaryFile("w", suffix=".ini", delete=False) as f:
        cp.write(f)
        nodelta_cfg = f.name

    print("=== run 2/2: without delta features ===")
    base_args[1] = nodelta_cfg
    without_delta = nstream.main(list(base_args))

    print("\n=== delta-feature ablation ===")
    print(f"{'':>14} {'val CR':>8} {'test CR':>8} {'best val cost':>14}")
    print(f"{'with delta':>14} {with_delta.best_cr:8.3f} {with_delta.test_cr:8.3f} "
          f"{with_delta.best_val:14.4f}")
    print(f"{'without delta':>14} {without_delta.best_cr:8.3f} "
          f"{without_delta.test_cr:8.3f} {without_delta.best_val:14.4f}")
    return with_delta, without_delta


if __name__ == "__main__":
    main()
