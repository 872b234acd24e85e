#!/usr/bin/env python
"""Strip optimizer state from a checkpoint, keeping only model params
(reference tools/remove_solver_states.py). Useful to shrink final
checkpoints for distribution."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", help="orbax checkpoint directory")
    parser.add_argument("--out", default=None,
                        help="output path (default: <ckpt>_nosolver)")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.ckpt)
    out = os.path.abspath(args.out or path.rstrip("/") + "_nosolver")

    ckptr = ocp.StandardCheckpointer()
    data = ckptr.restore(path)
    stripped = {
        "state": {"params": data["state"]["params"], "opt_state": None},
        "extra": data.get("extra", {}),
    }
    ckptr.save(out, stripped, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
