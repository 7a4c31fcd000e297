"""CLI entry point.

Counterpart of the reference's ``src/difacto.cc`` :: main — a config file
of ``key = val`` lines plus CLI ``key=val`` overrides, dispatched to a
learner. The reference picks its role (scheduler/server/worker) from
ps-lite env vars; under SPMD there are no roles — one program, one entry:

    python -m difacto_tpu [config.conf] [key=val ...]
"""

from __future__ import annotations

import logging
import os
import sys

from .config import Config
from .utils import arg_parser


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS / DIFACTO_NUM_CPU_DEVICES even when a TPU
    plugin ignores the env var (observed with the axon plugin): re-apply
    them programmatically before any device use."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    ndev = os.environ.get("DIFACTO_NUM_CPU_DEVICES")
    if ndev:
        jax.config.update("jax_num_cpu_devices", int(ndev))


def create_learner(cfg: Config):
    """Learner::Create (reference: src/learner.cc factory)."""
    if cfg.learner.learner == "sgd":
        from .learners.sgd import SGDLearner

        return SGDLearner(cfg)
    if cfg.learner.learner == "bcd":
        from .learners.bcd import BCDLearner

        return BCDLearner(cfg)
    raise ValueError(f"unknown learner {cfg.learner.learner!r}")


def main(argv: list[str] | None = None) -> int:
    from .base import tune_malloc

    tune_malloc()  # large ingest temporaries must not page-fault
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s] %(message)s",
        datefmt="%H:%M:%S",
    )
    if argv is None:
        argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print(Config())
        return 0
    _apply_platform_env()
    from .parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    kwargs = arg_parser.parse(argv)
    cfg = Config.from_kwargs(kwargs)
    if not cfg.data.data_in:
        raise SystemExit("data_in is required")
    if cfg.learner.task == "predict":
        return run_predict(cfg)
    learner = create_learner(cfg)
    learner.run()
    return 0


def run_predict(cfg: Config) -> int:
    """Batch prediction (reference: the model_in + pred_out flow —
    same binary, no training jobs). Scores are raw margins py; apply a
    sigmoid for probabilities."""
    import numpy as np

    if not cfg.learner.model_in:
        raise SystemExit("task=predict requires model_in")
    import jax

    from .learners.sgd import SGDLearner
    from .ops.metrics import exact_auc, logloss

    # scoring always uses the SGD eval path — checkpoints are a shared
    # format, so BCD-trained linear models score through it too
    cfg.learner.max_num_epochs = 0
    cfg.learner.learner = "sgd"
    learner = SGDLearner(cfg)
    py, labels = learner.predict(cfg.data.data_in)
    nproc = jax.process_count()
    if cfg.learner.pred_out:
        from .data.io import is_remote, open_uri

        # multi-process: each worker scores its own input part and writes
        # its own output part file (reference: every worker's pred job
        # writes pred_out + its rank), in the part's row order
        out = cfg.learner.pred_out
        if nproc > 1:
            out = f"{out}.part{jax.process_index()}"
        if is_remote(out):
            with open_uri(out, "wb") as f:
                np.savetxt(f, py, fmt="%.6g")
        else:
            np.savetxt(out, py, fmt="%.6g")
        logging.getLogger("difacto_tpu").info(
            "wrote %d scores to %s", len(py), out
        )
    if nproc > 1:
        # metrics cover the GLOBAL prediction set (same value logged by
        # every process — the lockstepped eval collectives already ran)
        labels, py = SGDLearner._allgather_pairs(labels, py)
    if len(set(np.asarray(labels) > 0)) > 1:
        logging.getLogger("difacto_tpu").info(
            "predict: #ex %d  logloss %.6f  auc %.6f",
            len(py), logloss(labels, py), exact_auc(labels, py),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
