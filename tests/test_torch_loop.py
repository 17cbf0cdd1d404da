"""Control-flow pins for the torch training loop (VERDICT r10 item 6).

The container has no torch, so `ml/torch_models.py`'s tensor math cannot
execute here -- but the loop SEMANTICS the reference specifies
(`core/model.py:228-316`: Adam+MSE with grad-norm clip between backward
and step, early stopping with patience on validation loss, best-state
restore) are pure control flow. Round 11 extracted them into
`run_training_loop` / `train_one_batch`, which `fit()` wires torch
closures into; these tests drive the same functions with fake backends so
every branch of the loop is pinned even though the tensor math is not.
No torch import anywhere in this file.
"""

from __future__ import annotations

from electricity_forecast_pipeline_airflow_k8s_spark.ml.torch_models import (
    run_training_loop,
    train_one_batch,
)


class FakeBackend:
    """Scripted validation losses + recording snapshot/restore."""

    def __init__(self, val_losses):
        self.val_losses = list(val_losses)
        self.epoch = 0
        self.snapshots = []  # epoch index at each snapshot
        self.restored = None

    def train_epoch(self):
        self.epoch += 1
        return 1.0 / self.epoch  # arbitrary decreasing train loss

    def eval_val(self):
        return self.val_losses[self.epoch - 1]

    def snapshot(self):
        self.snapshots.append(self.epoch)
        return {"epoch": self.epoch}

    def restore(self, state):
        self.restored = state

    def run(self, epochs, patience):
        return run_training_loop(
            self.train_epoch,
            epochs,
            eval_val=self.eval_val,
            snapshot=self.snapshot,
            restore=self.restore,
            patience=patience,
        )


def test_early_stop_after_patience_consecutive_stalls():
    # improvement at e1 and e2, then 3 consecutive non-improvements with
    # patience=3 -> stop after epoch 5, epochs 6+ never run
    fb = FakeBackend([5.0, 4.0, 6.0, 6.0, 6.0, 1.0, 1.0, 1.0])
    hist = fb.run(epochs=8, patience=3)
    assert len(hist["val_loss"]) == 5
    assert fb.epoch == 5  # the would-be-best epoch 6 was never reached


def test_stall_counter_resets_on_improvement():
    # two stalls, an improvement, two more stalls: with patience=3 the
    # counter must RESET at the improvement, so all 6 epochs run
    fb = FakeBackend([5.0, 6.0, 6.0, 4.0, 6.0, 6.0])
    hist = fb.run(epochs=6, patience=3)
    assert len(hist["val_loss"]) == 6
    assert fb.restored == {"epoch": 4}


def test_tie_counts_as_stall():
    # strict <: repeating the best value is NOT an improvement
    fb = FakeBackend([5.0, 5.0, 5.0, 5.0, 1.0])
    hist = fb.run(epochs=5, patience=3)
    assert len(hist["val_loss"]) == 4  # stalls at e2,e3,e4 -> stop
    assert fb.snapshots == [1]  # only the first epoch snapshotted


def test_best_checkpoint_restored_not_last():
    # best at epoch 2; later epochs are worse; restore must pick epoch 2
    fb = FakeBackend([5.0, 3.0, 4.0, 4.5])
    fb.run(epochs=4, patience=10)
    assert fb.snapshots == [1, 2]
    assert fb.restored == {"epoch": 2}


def test_restore_happens_on_epoch_exhaustion_too():
    # no early stop (patience never hit) -- the best state must STILL be
    # restored when the loop exits by running out of epochs
    fb = FakeBackend([3.0, 2.0, 2.5])
    hist = fb.run(epochs=3, patience=10)
    assert len(hist["val_loss"]) == 3
    assert fb.restored == {"epoch": 2}


def test_no_validation_runs_all_epochs_without_restore():
    calls = []
    hist = run_training_loop(lambda: calls.append(1) or 0.5, epochs=7)
    assert len(calls) == 7
    assert hist["train_loss"] == [0.5] * 7
    assert hist["val_loss"] == []


def test_history_records_both_losses_per_epoch():
    fb = FakeBackend([5.0, 4.0, 3.0])
    hist = fb.run(epochs=3, patience=10)
    assert hist["train_loss"] == [1.0, 0.5, 1.0 / 3.0]
    assert hist["val_loss"] == [5.0, 4.0, 3.0]


def test_batch_step_order_clip_between_backward_and_step():
    """The reference clips grad norm BETWEEN backward and step
    (`core/model.py:252-258`) -- clipping before backward is a no-op and
    after step is too late. Pin the exact call order."""
    calls = []
    loss_obj = object()

    out = train_one_batch(
        zero_grad=lambda: calls.append("zero_grad"),
        compute_loss=lambda: (calls.append("loss") or (loss_obj, 0.25)),
        backward=lambda loss: calls.append(("backward", loss is loss_obj)),
        clip_grads=lambda: calls.append("clip"),
        step=lambda: calls.append("step"),
    )
    assert calls == [
        "zero_grad",
        "loss",
        ("backward", True),
        "clip",
        "step",
    ]
    assert out == 0.25


def test_fit_wires_the_pure_loop():
    """`fit()` must route through run_training_loop (the gate stays: no
    torch here, so fit itself raises ImportError before reaching it --
    verify the wiring by source inspection, the same style as the
    existing gated-code pins in test_ml.py)."""
    import inspect

    from electricity_forecast_pipeline_airflow_k8s_spark.ml import torch_models

    src = inspect.getsource(torch_models.fit)
    assert "run_training_loop(" in src
    assert "train_one_batch(" in src
