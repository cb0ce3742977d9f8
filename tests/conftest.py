"""Test harness: run everything on a virtual 8-device CPU mesh.

This exercises the real shard_map/psum/sharding code paths without TPU
hardware, per SURVEY.md §4 (JAX's standard distributed-testing fake).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image preloads jax (sitecustomize) with the axon TPU platform before
# conftest runs, so env vars alone are too late — override the resolved
# config as well (backends are created lazily, so this still applies).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


TINY_CONFIG = {
    "model": {
        "denoise_net": "unet",
        "max_it": 50,
        "validate_every": 0,
        "validate_from": 0,
        "checkpoint_every": 10,
        "log_every": 5,
        "view_fusion_params": {
            "beta_schedule": {
                "train": {
                    "schedule": "linear",
                    "num_timesteps": 8,
                    "linear_start": 1e-4,
                    "linear_end": 0.09,
                },
                "test": {
                    "schedule": "linear",
                    "num_timesteps": 8,
                    "linear_start": 1e-4,
                    "linear_end": 0.09,
                },
            }
        },
        "denoise_net_params": {
            "image_size": 8,
            "in_channel": 6,
            "out_channel": 6,
            "inner_channel": 8,
            "norm_groups": 4,
            "res_blocks": 1,
            "attn_res": [4],
            "channel_mults": [1, 2],
        },
    },
    "data": {
        "params": {
            "num_workers": 1,
            "max_views": 3,
            "batch_size": 8,
            "train": {"params": {"start_shard": 0, "end_shard": 0,
                                 "path": "", "mode": "train"}},
            "test": {"params": {"start_shard": 0, "end_shard": 0,
                                "path": "", "mode": "test", "size": 16}},
        }
    },
    "tpu": {"compute_dtype": "float32", "seed": 0, "sample_num": 4},
}


@pytest.fixture
def tiny_config():
    from viewfusion_tpu.config import Config

    return Config.from_dict(TINY_CONFIG)
