"""Worker for tests/test_multiprocess.py: one of two JAX processes.

Exercises the REAL multi-process code paths that single-process tests
can only fake (VERDICT r1 missing #5): jax.distributed rendezvous,
per-host shard split (nmr.py), replicated packed-row indices
(trainer._global_packed_counts), make_global_batch assembly
(mesh.py:158-181), and one jitted packed train step over the global
array — the loss must come out identical on every process.

Invoked:  python tests/_mp_worker.py <process_id> <coordinator_port>
Prints:   "RESULT <process_id> <loss> <psnr_mean>" on success.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    os.environ["JAX_PLATFORMS"] = "cpu"
    # 2 virtual devices per process -> a 2-process data=2 x view=2 mesh:
    # the packed gather reads (data, view)-sharded cond with REPLICATED
    # row indices across a real process boundary (the shipped config's
    # layout on a pod).
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
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import numpy as np

    from viewfusion_tpu.config import Config
    from viewfusion_tpu.data.nmr import NMRStream
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.ops.metrics import compute_psnr
    from viewfusion_tpu.parallel.mesh import (
        MeshSpec, make_global_batch, make_mesh, replicate,
    )
    from viewfusion_tpu.training.trainer import Experiment

    # --- per-host shard split (nmr.py:121-128) ------------------------
    stream = NMRStream(["s0.tar", "s1.tar", "s2.tar", "s3.tar"], "train",
                       host_id=pid, num_hosts=2, native=False)
    assert stream.urls == [f"s{pid}.tar", f"s{pid + 2}.tar"]
    try:
        NMRStream(["s0.tar"], "train", host_id=pid, num_hosts=2,
                  native=False)
        raise AssertionError("uneven shard split must raise")
    except ValueError:
        pass

    # --- tiny model + global batch ------------------------------------
    cfg = Config.from_dict({
        "model": {
            "denoise_net": "unet",
            "view_fusion_params": {"beta_schedule": {
                "train": {"schedule": "linear", "num_timesteps": 8,
                          "linear_start": 1e-4, "linear_end": 0.09},
                "test": {"schedule": "linear", "num_timesteps": 8,
                         "linear_start": 1e-4, "linear_end": 0.09},
            }},
            "denoise_net_params": {
                "image_size": 8, "in_channel": 6, "out_channel": 6,
                "inner_channel": 8, "norm_groups": 4, "res_blocks": 1,
                "attn_res": [4], "channel_mults": [1, 2],
            },
        },
        "data": {"params": {"max_views": 2, "batch_size": 4}},
        "tpu": {"compute_dtype": "float32"},
    })
    model = ViewFusion.from_config(cfg)
    # data across the two processes, view across each process's two
    # local devices — the shipped packed_views layout on a pod slice
    mesh = make_mesh(MeshSpec(data=2, view=2))

    local_b, n, hw = 2, 2, 8
    # identical global data on both hosts, sliced per host — so the
    # SPMD loss is checkable against determinism across processes
    rng = np.random.default_rng(7)
    g_target = rng.uniform(0, 1, (4, hw, hw, 3)).astype(np.float32)
    g_cond = rng.uniform(0, 1, (4, n, hw, hw, 3)).astype(np.float32)
    g_angle = rng.uniform(0, 2 * np.pi, (4,)).astype(np.float32)
    sl = slice(pid * local_b, (pid + 1) * local_b)

    # --- replicated packed counts via the real trainer helper ---------
    exp = Experiment.__new__(Experiment)
    exp.config = cfg
    exp.local_batch_size = local_b
    exp.max_views = n
    counts_local, sample_idx, view_idx = exp._global_packed_counts(salt=3)
    assert len(counts_local) == local_b
    assert sample_idx.max() == 3  # indices enumerate the GLOBAL batch

    local = {
        "target": g_target[sl],
        "cond": g_cond[sl],
        "angle": g_angle[sl],
        "view_count": counts_local.astype(np.int32),
        "sample_idx": sample_idx,
        "view_idx": view_idx,
    }
    gb = make_global_batch(local, mesh)
    assert gb["target"].shape == (4, hw, hw, 3)

    import jax.numpy as jnp

    params = replicate(
        jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.asarray(g_cond[:1]),
                            jnp.asarray(g_target[:1])),
        mesh,
    )

    @jax.jit
    def step(params, batch):
        def loss_fn(p):
            return model.loss_packed(
                p, jax.random.PRNGKey(1), batch["target"], batch["cond"],
                batch["view_count"], batch["angle"],
                batch["sample_idx"], batch["view_idx"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # gradient magnitude doubles as a cross-process psum check
        gnorm = jnp.sqrt(sum(jnp.sum(g**2)
                             for g in jax.tree_util.tree_leaves(grads)))
        return loss, gnorm

    loss, gnorm = step(params, gb)

    # --- eval-style global metric reduction ---------------------------
    psnr = compute_psnr(gb["target"], gb["target"] * 0.9 + 0.05)
    psnr_mean = float(jnp.mean(psnr))

    # --- gather_all on a non-fully-addressable global array -----------
    from viewfusion_tpu.parallel.collectives import gather_all

    per_proc = gather_all(gb["angle"])
    assert len(per_proc) == 2, len(per_proc)  # one tensor per process
    got = np.concatenate([np.asarray(t) for t in per_proc])
    np.testing.assert_allclose(got, g_angle, rtol=1e-6)

    # --- checkpoint save on multi-host state (sync fallback: a jitted
    # snapshot from host 0 alone would deadlock; save_async must detect
    # the non-fully-addressable leaves and write synchronously) --------
    import tempfile

    from viewfusion_tpu.training.checkpoint import Checkpoint

    ckdir = os.path.join(tempfile.gettempdir(), f"mp_ck_{port}")
    ck = Checkpoint(ckdir, config_yaml="x: 1", is_host0=pid == 0)
    ck.save_async("model.msgpack", {"params": params}, it=1)
    ck.flush()
    if pid == 0:
        assert os.path.exists(os.path.join(ckdir, "model.msgpack"))

    # --- ZeRO-1 partitioned state: cross-process shard + collective
    # gather-on-save (checkpoint._gather_partitioned) ------------------
    import optax

    from viewfusion_tpu.parallel.mesh import zero1_shard_specs

    tx = optax.adam(1e-3)
    params_host = jax.tree_util.tree_map(np.asarray, params)
    opt_host = jax.tree_util.tree_map(
        np.asarray, tx.init(params_host)
    )
    opt_shardings = zero1_shard_specs(opt_host, mesh)
    opt = jax.device_put(opt_host, opt_shardings)
    assert any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        and not x.sharding.is_fully_replicated
        for x in jax.tree_util.tree_leaves(opt)
    ), "no opt leaf is partitioned across processes"
    # collective save: BOTH processes call; host 0 writes global values
    ck.save_async("opt.msgpack", {"opt": opt}, it=2)
    ck.flush()
    if pid == 0:
        restored, extra = ck.load("opt.msgpack", {"opt": opt_host})
        assert extra["it"] == 2
        for a, b in zip(
            jax.tree_util.tree_leaves(opt_host),
            jax.tree_util.tree_leaves(restored["opt"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    print(f"RESULT {pid} {float(loss):.10f} {float(gnorm):.8f} "
          f"{psnr_mean:.8f}", flush=True)


if __name__ == "__main__":
    main()
