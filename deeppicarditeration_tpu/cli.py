"""CLI: ``dpi-tpu train <cfg.yaml> [KEY value ...]`` / ``dpi-tpu evaluate``.

Reference parity: picard/main.py (typer app with train/evaluate). Overrides
are ``KEY.SUBKEY value`` pairs merged last (leading dashes tolerated).
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dpi-tpu",
                                     description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="run the Picard training loop")
    p_train.add_argument("configfile")
    p_train.add_argument("overrides", nargs="*",
                         help="KEY value pairs, e.g. PICARD.N 4")

    p_eval = sub.add_parser("evaluate", help="evaluate an experiment dir")
    p_eval.add_argument("exp_dir")
    p_eval.add_argument("--do-l2", action="store_true")
    p_eval.add_argument("--sol-file", default=None,
                        help="h5/npz/npy (tx, u) file for l2_file sweeps")
    p_eval.add_argument("--n-points", type=int, default=1000)
    p_eval.add_argument("--n-estimate", type=int, default=1_000_000)
    p_eval.add_argument("--out", default=None,
                        help="append the per-iteration records as JSON "
                             "lines to this file")

    args = parser.parse_args(argv)

    from deeppicarditeration_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    # persistent XLA compile cache: tunnel compiles are minutes per jit
    # signature; a warm cache halves short-recipe wall (opt out with
    # DPI_NO_COMPILE_CACHE=1)
    enable_persistent_compile_cache()

    if args.command == "train":
        from deeppicarditeration_tpu.parallel import distributed

        # multi-host first, before anything touches devices (§5.8); no-op
        # unless the standard JAX_* coordinator env vars are set
        distributed.initialize()

        from deeppicarditeration_tpu.config import load_cfg
        from deeppicarditeration_tpu.training.picard import PicardRunner

        assert pathlib.Path(args.configfile).exists(), (
            f"config file {args.configfile} does not exist")
        # strip leading dashes from KEYS only (--KEY value convenience);
        # stripping values would silently sign-flip negative numbers
        overrides = [a.lstrip("-") if i % 2 == 0 else a
                     for i, a in enumerate(args.overrides)]
        cfg = load_cfg(args.configfile, overrides or None)
        PicardRunner(cfg).run()
    elif args.command == "evaluate":
        from deeppicarditeration_tpu.evaluation.experiment import (
            ExperimentEvaluator,
        )

        ev = ExperimentEvaluator(args.exp_dir,
                                 n_estimate_terminal=args.n_estimate,
                                 n_estimate_integral=args.n_estimate)
        if args.do_l2:
            if args.sol_file is not None:
                recs, kind = ev.l2_file(args.sol_file), "l2_file"
            else:
                recs, kind = ev.l2(args.n_points), "l2"
        else:
            recs, kind = ev.monte_carlo_at_zero(), "mc_at_zero"
        if args.out:
            import json
            import time

            out = pathlib.Path(args.out)
            out.parent.mkdir(parents=True, exist_ok=True)
            # --out appends, so each record carries a run delimiter
            # (invocation timestamp + experiment + protocol) letting
            # downstream consumers separate reruns of the same command
            run_id = {"run_ts": round(time.time(), 3),
                      "exp": pathlib.Path(args.exp_dir).name,
                      "protocol": kind}
            with open(out, "a") as f:
                for r in recs:
                    f.write(json.dumps({**run_id, **r}) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
