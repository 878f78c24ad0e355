"""Graceful preemption: a SIGTERM/SIGUSR1 (or programmatic request) makes
the trainer checkpoint mid-epoch and exit cleanly; --resume then continues
from the exact interrupted batch, bit-identical to an uninterrupted run.

The reference has no preemption story at all (SURVEY §5: a crash loses the
epoch in progress, reference train.py:102-110 saves only at epoch end) —
this is the elastic-recovery subsystem the TPU build adds.
"""

import os
import signal
import time

import numpy as np
import pytest

from tests._synth import build_synth_dataset

from sat_tpu.config import Config
from sat_tpu.data import generate_json_data


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("preempt_data"))
    build_synth_dataset(root, n_train=6, n_val=2, n_test=2, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 10)
    return root


def make_cfg(data_root, ckpt_dir, **kw):
    defaults = dict(
        data=data_root, network="vgg19", image_size=32, batch_size=2,
        epochs=1, tf=True, ado=False, attention=True, fraction=1.0,
        log_interval=1, checkpoint_dir=str(ckpt_dir),
        perform_test=False, seed=7, lr=1e-3)
    defaults.update(kw)
    return Config(**defaults)


def test_preempt_and_exact_resume(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer

    # Uninterrupted baseline run.
    ta = Trainer(make_cfg(data_root, tmp_path / "a"))
    ta.fit()
    total_steps = int(ta.state.step)
    assert total_steps >= 4

    # Same run, preempted after the 2nd train step.
    tb = Trainer(make_cfg(data_root, tmp_path / "b"))
    orig_step = tb.train_step
    calls = {"n": 0}

    def wrapped(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            tb.request_preempt()
        return orig_step(*args, **kw)

    tb.train_step = wrapped
    result = tb.fit()
    assert result.get("preempted") is True
    assert int(tb.state.step) == 2

    # Resume: picks up epoch 1 at batch offset 2 and finishes it.
    tb2 = Trainer(make_cfg(data_root, tmp_path / "b", resume=True))
    assert tb2.start_epoch == 1
    assert tb2._resume_batch_offset == 2
    assert int(tb2.state.step) == 2
    result2 = tb2.fit()
    assert "preempted" not in result2
    assert int(tb2.state.step) == total_steps

    # The continued run is bit-identical to the uninterrupted one: same
    # batches (deterministic loader), same dropout rngs (step-folded).
    for name in ("lstm", "deep_output", "init_h"):
        for leaf, a, b in zip(
                ta.state.params[name].keys(),
                ta.state.params[name].values(),
                tb2.state.params[name].values()):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"param {name}/{leaf} diverged across preempt+resume")

    # A subsequent resume sees the completed epoch and starts the next one.
    tb3 = Trainer(make_cfg(data_root, tmp_path / "b", epochs=2, resume=True))
    assert tb3.start_epoch == 2
    assert tb3._resume_batch_offset == 0


def test_preempt_during_validation(data_root, tmp_path):
    """A preemption signal arriving during the (potentially long) eval pass
    must not be ignored until validation finishes: the trained epoch is
    checkpointed as complete and the run exits; --resume starts the next
    epoch."""
    from sat_tpu.engine.loop import Trainer

    tr = Trainer(make_cfg(data_root, tmp_path / "ev"))
    orig = tr.eval_step
    calls = {"n": 0}

    def wrapped(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 1:          # signal lands mid-validation
            tr.request_preempt()
        return orig(*args, **kw)

    tr.eval_step = wrapped
    result = tr.fit()
    assert result.get("preempted") is True
    assert calls["n"] >= 1

    tr2 = Trainer(make_cfg(data_root, tmp_path / "ev", epochs=2, resume=True))
    assert tr2.start_epoch == 2          # epoch 1 counted as completed
    assert tr2._resume_batch_offset == 0


def test_legacy_checkpoint_probe_and_resume(data_root, tmp_path):
    """Checkpoints from before mid-epoch-preemption support lack
    'batch_offset'. The resume path must detect that by PROBING the saved
    tree (ckpt.train_state_has_key), not by a blanket exception fallback
    that could silently zero a genuine mid-epoch offset (ADVICE r2)."""
    from sat_tpu.engine import checkpoint as ckpt
    from sat_tpu.engine.loop import Trainer

    tr = Trainer(make_cfg(data_root, tmp_path / "legacy"))
    tr.fit()
    step = int(tr.state.step)
    # modern layout carries the key...
    assert ckpt.train_state_has_key(str(tmp_path / "legacy"), step,
                                    "batch_offset")
    # ...now overwrite with a legacy-layout checkpoint at a later step
    ckpt.save_train_state(str(tmp_path / "legacy"), step + 1,
                          {"state": tr.state, "epoch": 1}, blocking=True)
    assert not ckpt.train_state_has_key(str(tmp_path / "legacy"), step + 1,
                                        "batch_offset")

    tr2 = Trainer(make_cfg(data_root, tmp_path / "legacy", epochs=2,
                           resume=True))
    assert tr2.start_epoch == 2            # epoch 1 counted as completed
    assert tr2._resume_batch_offset == 0


def test_signal_handler_requests_preempt(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer

    tr = Trainer(make_cfg(data_root, tmp_path / "sig", epochs=0))
    assert not tr._preempt_requested
    with tr._preempt_handlers():
        os.kill(os.getpid(), signal.SIGUSR1)
        for _ in range(100):            # delivery is between bytecodes
            if tr._preempt_requested:
                break
            time.sleep(0.01)
    assert tr._preempt_requested
    # handlers restored on exit
    assert signal.getsignal(signal.SIGUSR1) in (signal.SIG_DFL,
                                                signal.SIG_IGN,
                                                signal.default_int_handler)


def test_keep_checkpoints_pruning(data_root, tmp_path):
    """--keep-checkpoints N retains only the newest N orbax train-state
    dirs (decoder .npz files are untouched) and resume still works."""
    import os

    from sat_tpu.engine import checkpoint as ckpt
    from sat_tpu.engine.loop import Trainer

    tr = Trainer(make_cfg(data_root, tmp_path / "gc", epochs=3,
                          keep_checkpoints=2))
    tr.fit()
    root = tmp_path / "gc" / "orbax"
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    assert len(steps) == 2
    assert ckpt.latest_train_state_step(str(tmp_path / "gc")) == steps[-1]
    # all three per-epoch decoder .npz files survive
    npz = [f for f in os.listdir(tmp_path / "gc") if f.endswith(".npz")]
    assert len(npz) == 3

    tr2 = Trainer(make_cfg(data_root, tmp_path / "gc", epochs=4,
                           keep_checkpoints=2, resume=True))
    assert tr2.start_epoch == 4


def test_prune_keep_zero_keeps_everything(tmp_path):
    """keep<=0 must prune NOTHING: --keep-checkpoints 0 (the default)
    means retain all, and a caller passing the flag straight through must
    never mass-delete resume state (review r3 — keep==0 used to delete
    every checkpoint)."""
    import os

    import jax.numpy as jnp

    from sat_tpu.engine import checkpoint as ckpt

    for step in (1, 2, 3):
        ckpt.save_train_state(str(tmp_path), step,
                              {"x": jnp.zeros((2,)), "step": step},
                              blocking=True)
    for keep in (0, -1):
        assert ckpt.prune_train_states(str(tmp_path), keep) == []
    root = tmp_path / "orbax"
    assert sorted(int(d) for d in os.listdir(root)) == [1, 2, 3]
    assert ckpt.prune_train_states(str(tmp_path), 2) == [1]


def test_has_key_probe_surfaces_transient_errors(tmp_path, monkeypatch):
    """A transient metadata-read failure on a modern checkpoint must
    propagate, NOT be misreported as a legacy layout (which would route
    resume onto the wrong template and crash with a misleading
    tree-structure mismatch). Only a genuinely absent metadata file means
    legacy/foreign (review r3)."""
    import jax.numpy as jnp
    import pytest

    from sat_tpu.engine import checkpoint as ckpt

    ckpt.save_train_state(str(tmp_path), 7,
                          {"x": jnp.zeros((2,)), "batch_offset": 0},
                          blocking=True)
    assert ckpt.train_state_has_key(str(tmp_path), 7, "batch_offset")
    assert not ckpt.train_state_has_key(str(tmp_path), 7, "nope")

    class Boom:
        def metadata(self, path):
            raise OSError("transient read failure")

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: Boom())
    with pytest.raises(OSError):
        ckpt.train_state_has_key(str(tmp_path), 7, "batch_offset")

    class Missing:
        def metadata(self, path):
            raise FileNotFoundError(path)

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: Missing())
    assert not ckpt.train_state_has_key(str(tmp_path), 7, "batch_offset")


def test_has_key_probe_format_error_falls_back_when_dir_exists(
        tmp_path, monkeypatch):
    """Metadata that exists but raises a FORMAT error on parse (old/foreign
    orbax layout whose probe raises ValueError/KeyError/TypeError instead of
    FileNotFoundError) must fall back to the legacy template when the step
    dir exists — but the same error with no step dir is a genuine bug and
    must propagate (ADVICE r3)."""
    import jax.numpy as jnp
    import pytest

    from sat_tpu.engine import checkpoint as ckpt

    ckpt.save_train_state(str(tmp_path), 7,
                          {"x": jnp.zeros((2,)), "batch_offset": 0},
                          blocking=True)

    class FormatBoom:
        def __init__(self, exc):
            self.exc = exc

        def metadata(self, path):
            raise self.exc

    for exc in (ValueError("bad metadata"), KeyError("tree"),
                TypeError("not a tree")):
        monkeypatch.setattr(ckpt, "_checkpointer",
                            lambda exc=exc: FormatBoom(exc))
        # Step dir exists -> legacy fallback (key reported absent).
        assert not ckpt.train_state_has_key(str(tmp_path), 7, "batch_offset")
        # No step dir at all -> the format error propagates.
        with pytest.raises(type(exc)):
            ckpt.train_state_has_key(str(tmp_path), 99, "batch_offset")
