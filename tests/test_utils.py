"""Unit tests: LR schedule numerics, image grid/GIF utils, checkpoint
partial restore."""

import os

import numpy as np
import pytest

from viewfusion_tpu.training.schedulers import LrScheduler, lr_schedule
from viewfusion_tpu.utils.image import make_grid, save_gif, save_png, to_uint8


def test_lr_scheduler_reference_numerics():
    """Warmup then exponential decay (reference utils/schedulers.py with
    experiment.py:112-116 constants)."""
    s = LrScheduler(peak_lr=1e-4, peak_it=2500, decay_rate=0.16,
                    decay_it=4_000_000)
    assert s.get_cur_lr(0) == 0.0
    assert s.get_cur_lr(1250) == pytest.approx(5e-5)
    assert s.get_cur_lr(2500) == pytest.approx(1e-4)
    it = 2500 + 4_000_000
    assert s.get_cur_lr(it) == pytest.approx(1e-4 * 0.16)

    # optax schedule matches the host class
    f = lr_schedule(peak_lr=1e-4, peak_it=2500, decay_rate=0.16,
                    decay_it=4_000_000)
    for it in (0, 100, 2500, 10_000, 1_000_000):
        assert float(f(it)) == pytest.approx(s.get_cur_lr(it), rel=1e-5)


def test_make_grid_layout():
    imgs = np.zeros((6, 4, 4, 3), np.float32)
    for i in range(6):
        imgs[i] = (i + 1) / 6.0
    grid = make_grid(imgs, nrow=3, padding=1, pad_value=-1)
    # 2 rows x 3 cols of 4px tiles with 1px padding
    assert grid.shape == (1 + 2 * 5, 1 + 3 * 5, 3)
    assert grid[0, 0, 0] == -1  # border padding
    np.testing.assert_allclose(grid[1:5, 1:5], imgs[0])
    np.testing.assert_allclose(grid[6:10, 11:15], imgs[5])


def test_make_grid_scale_each():
    imgs = np.stack([np.full((2, 2, 3), 5.0), np.full((2, 2, 3), -3.0)])
    imgs[0, 0, 0] = 0.0
    imgs[1, 0, 0] = 1.0
    grid = make_grid(imgs, nrow=2, padding=0, scale_each=True)
    assert grid.max() <= 1.0 and grid.min() >= 0.0


def test_to_uint8_and_png_gif(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(
        np.float32
    )
    u8 = to_uint8(img)
    assert u8.dtype == np.uint8
    assert to_uint8(u8) is u8  # already uint8 passthrough
    assert to_uint8(np.full((2, 2, 3), 2.0)).max() == 255  # clipped

    png = str(tmp_path / "x.png")
    save_png(img, png)
    gif = str(tmp_path / "x.gif")
    save_gif([u8, 255 - u8], gif, duration=0.05)
    assert os.path.getsize(png) > 0 and os.path.getsize(gif) > 0
    from PIL import Image

    assert Image.open(gif).n_frames == 2


def test_checkpoint_async_save(tmp_path):
    """save_async: ordered background writes, flush barrier, snapshot
    isolation (later in-place mutation of the live state must not leak
    into the queued save), and worker-error surfacing."""
    import jax.numpy as jnp

    from viewfusion_tpu.training.checkpoint import Checkpoint

    ckpt = Checkpoint(str(tmp_path))
    w = jnp.arange(4.0)
    ckpt.save_async("model.msgpack", {"params": {"w": w}}, it=1)
    # second save to the same file must win (submission order)
    ckpt.save_async("model.msgpack", {"params": {"w": w + 1}}, it=2)
    ckpt.save_async("best_model_all.msgpack", {"params": {"w": w + 2}},
                    it=2, ssim=0.9)
    ckpt.flush()

    state, extra = ckpt.load("model.msgpack",
                             {"params": {"w": np.zeros(4, np.float32)}})
    np.testing.assert_array_equal(state["params"]["w"],
                                  np.arange(4.0) + 1)
    assert extra["it"] == 2
    state, extra = ckpt.load("best_model_all.msgpack",
                             {"params": {"w": np.zeros(4, np.float32)}})
    np.testing.assert_array_equal(state["params"]["w"],
                                  np.arange(4.0) + 2)
    assert extra == {"it": 2, "ssim": 0.9}

    # backpressure coalescing: with the writer blocked, three rolling
    # saves to one file collapse — only the NEWEST is written
    import threading
    import time as _time

    slow = Checkpoint(str(tmp_path / "slow"))
    gate = threading.Event()
    orig_write = slow._write
    writes = []

    def blocked_write(path, sd, extra):
        gate.wait(10)
        writes.append(extra["it"])
        orig_write(path, sd, extra)

    slow._write = blocked_write
    slow.save_async("model.msgpack", {"params": {"w": w}}, it=1)
    _time.sleep(0.2)  # worker is now blocked inside save it=1
    slow.save_async("model.msgpack", {"params": {"w": w + 1}}, it=2)
    slow.save_async("model.msgpack", {"params": {"w": w + 2}}, it=3)
    gate.set()
    slow.flush()
    assert writes == [1, 3], writes  # it=2 superseded before it started
    _, extra = slow.load("model.msgpack",
                         {"params": {"w": np.zeros(4, np.float32)}})
    assert extra["it"] == 3

    # a failing write surfaces on flush (unwritable directory)
    bad = Checkpoint(str(tmp_path))
    bad.checkpoint_dir = str(tmp_path / "missing" / "deeper")
    bad.save_async("model.msgpack", {"params": {"w": w}}, it=1)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        bad.flush()

    # non-host0 processes never write
    silent = Checkpoint(str(tmp_path / "h1"), is_host0=False)
    silent.save_async("model.msgpack", {"params": {"w": w}}, it=1)
    silent.flush()
    assert not (tmp_path / "h1").exists()


def test_checkpoint_params_only_restore(tmp_path):
    """Converted (params-only) checkpoints restore with fresh opt state
    (trainer fallback path)."""
    from viewfusion_tpu.training.checkpoint import Checkpoint

    ckpt = Checkpoint(str(tmp_path))
    params = {"w": np.arange(4.0, dtype=np.float32)}
    ckpt.save("best_model_all.msgpack", {"params": params}, it=7, ssim=0.5)

    state, extra = ckpt.load("best_model_all.msgpack",
                             {"params": {"w": np.zeros(4, np.float32)}})
    np.testing.assert_array_equal(state["params"]["w"], params["w"])
    assert extra == {"it": 7, "ssim": 0.5}

    # fields missing from the checkpoint keep the template's fresh
    # values (schema evolution / params-only conversions)
    fresh_m = np.full(4, 7.0, np.float32)
    state2, _ = ckpt.load("best_model_all.msgpack",
                          {"params": {"w": np.zeros(4, np.float32)},
                           "opt_state": {"m": fresh_m}})
    np.testing.assert_array_equal(state2["params"]["w"], params["w"])
    np.testing.assert_array_equal(state2["opt_state"]["m"], fresh_m)


def test_checkpoint_backpressure_bounds_snapshot_memory(tmp_path):
    """Superseded QUEUED saves must drop their HBM snapshot at
    SUBMISSION time, not when the worker reaches them — otherwise a
    blocked writer pins one full state snapshot per queued save
    (advisor finding, round 2)."""
    import threading
    import time as _time

    import jax.numpy as jnp

    from viewfusion_tpu.training.checkpoint import Checkpoint

    ck = Checkpoint(str(tmp_path))
    gate = threading.Event()
    orig_write = ck._write

    def blocked_write(path, sd, extra):
        gate.wait(10)
        orig_write(path, sd, extra)

    ck._write = blocked_write
    w = jnp.arange(8.0)
    items = []
    for it in range(1, 4):
        ck.save_async("model.msgpack", {"params": {"w": w + it}}, it=it)
        items.append(ck._pending.get(ck._path("model.msgpack")))
        _time.sleep(0.1 if it == 1 else 0)  # let the worker grab save 1
    # save 2 was superseded by save 3 while still queued: its snapshot
    # must already be freed; save 3 (the live one) must still hold its
    assert items[1][2] is None
    assert items[2][2] is not None
    gate.set()
    ck.flush()
    state, extra = ck.load("model.msgpack",
                           {"params": {"w": np.zeros(8, np.float32)}})
    assert extra["it"] == 3
    np.testing.assert_array_equal(state["params"]["w"],
                                  np.arange(8.0) + 3)


def test_sync_save_orders_after_pending_async(tmp_path):
    """A synchronous save() must not be overwritten by an OLDER queued
    async save when the worker drains (advisor finding, round 2)."""
    import threading

    import jax.numpy as jnp

    from viewfusion_tpu.training.checkpoint import Checkpoint

    ck = Checkpoint(str(tmp_path))
    gate = threading.Event()
    orig_write = ck._write
    released = []

    def slow_write(path, sd, extra):
        if not released:
            gate.wait(10)
        orig_write(path, sd, extra)

    ck._write = slow_write
    w = jnp.arange(4.0)
    ck.save_async("model.msgpack", {"params": {"w": w}}, it=1)

    # sync save submitted later must land later: it drains the queue
    # first (release the gate from another thread so flush can finish)
    threading.Timer(0.2, lambda: (released.append(1), gate.set())).start()
    ck.save("model.msgpack", {"params": {"w": w + 10}}, it=2)
    ck.flush()
    _, extra = ck.load("model.msgpack",
                       {"params": {"w": np.zeros(4, np.float32)}})
    assert extra["it"] == 2
