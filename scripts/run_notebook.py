"""Execute examples/training_walkthrough.ipynb headlessly and commit outputs.

The reference ships its notebook WITH executed outputs
(/root/reference/avletters/avletters_training.ipynb — 11 cells of committed
cell history); this repo's walkthrough does the same, and
tests/test_aux_components.py::test_walkthrough_notebook_executes re-runs it
in the suite so the one artifact that could silently rot cannot.

Usage:
    python scripts/run_notebook.py            # execute + write outputs in place
    python scripts/run_notebook.py --check    # execute a copy, don't touch repo
"""

import argparse
import os
import sys


def execute(path: str, write: bool = True, timeout: int = 600):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(path, as_version=4)
    env = dict(os.environ)
    env.setdefault("IP_AVSR_NB_PLATFORM", "cpu")
    env.setdefault("JAX_PLATFORMS", "cpu")  # belt and braces; the in-notebook
    # config.update is what actually pins the backend under the axon plugin
    os.environ.update(env)
    client = NotebookClient(nb, timeout=timeout, kernel_name="python3",
                            resources={"metadata": {"path": os.path.dirname(
                                os.path.abspath(path))}})
    client.execute()
    n_out = sum(1 for c in nb.cells
                if c.cell_type == "code" and c.get("outputs"))
    if write:
        nbformat.write(nb, path)
    return nb, n_out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="execute without writing outputs back")
    ap.add_argument("--path", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "training_walkthrough.ipynb"))
    args = ap.parse_args(argv)
    nb, n_out = execute(args.path, write=not args.check)
    print(f"executed {args.path}: {n_out} code cells produced outputs"
          + ("" if args.check else " (written)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
