"""ATE evaluation CLI: Sim3-align an estimated trajectory to ground truth
and print the RMSE (the VSLAM-LAB scoring the reference relies on,
reference README.md:19).

    python tools/evaluate_ate.py est:<trajectory.csv|tum.txt> gt:<gt_tum.txt> \
        [max_diff:0.02]

Prints one JSON line: {"ate_rmse": ..., "n_pairs": ..., "scale": ...}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    args = {}
    for a in argv if argv is not None else sys.argv[1:]:
        if ":" in a:
            k, v = a.split(":", 1)
            args[k] = v
    if "est" not in args or "gt" not in args:
        print(__doc__)
        return 1
    from anyfeature_vslam_tpu.io import evaluation

    out = evaluation.evaluate(
        args["est"], args["gt"], max_diff=float(args.get("max_diff", 0.02))
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
