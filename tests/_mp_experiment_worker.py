"""Worker for tests/test_multiprocess_full.py: one of two JAX processes
running the FULL production Experiment (VERDICT r3 next #1).

Unlike tests/_mp_worker.py (which drives the individual multi-host
primitives), this constructs ``Experiment`` itself — ZeRO-1 sharded
optimizer state + async checkpointing on a data=2 x view=2 mesh that
spans the process boundary — and runs ``train()`` end-to-end: gated
eval with global metric reductions, best-model checkpoint policy
(checkpoint._gather_partitioned collective save + save_async's
non-addressable sync fallback), the train-time vis grid, and resume.

Invoked:  python tests/_mp_experiment_worker.py <pid> <port> <run_dir>
Prints:   "RESULT <pid> <it> <best_ssim> <best_psnr> <param_digest>"
          — every field must be identical across the two processes
          (SPMD determinism of the whole Experiment, not just one step).
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    run_dir = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2

    import jax.numpy as jnp
    import numpy as np

    from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs

    # src= the pre-created run dir (config.yaml inside): both processes
    # share ONE deterministic out_dir instead of racing the
    # timestamped-name path.  resume=True with no checkpoint present is
    # a cold start (experiment.py:139-145 semantics); with model.msgpack
    # present it is a real resume.
    exp = Experiment(ExperimentArgs(src=run_dir, train=True, resume=True))
    resumed_from = exp.it  # -1 cold, else the checkpointed step

    # the whole point: optimizer state genuinely partitioned ACROSS the
    # process boundary (data axis spans the two processes)
    assert exp.config.train.shard_opt_state
    assert exp.config.train.async_checkpoint
    assert any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        and not x.sharding.is_fully_replicated
        for x in jax.tree_util.tree_leaves(exp.state.opt_state)
    ), "no optimizer leaf is partitioned across processes"

    exp.train()

    digest = float(sum(
        jnp.sum(jnp.abs(l)) for l in
        jax.tree_util.tree_leaves(exp.state.params)
    ))
    assert np.isfinite(digest)
    print(f"RESULT {pid} {resumed_from} {exp.it} "
          f"{exp.best_metrics['ssim']:.10f} "
          f"{exp.best_metrics['psnr']:.10f} {digest:.8f}", flush=True)


if __name__ == "__main__":
    main()
