"""Import-gated torch architectures with reference parity.

Mirrors the reference's two forecaster architectures (semantics, not
code): an LSTM head (`core/model.py:44-85` -- stacked LSTM, last hidden
step, hidden->hidden//2 ReLU+dropout head, horizon-wide output) and a
Transformer encoder head (`core/model.py:88-138` -- 1->d_model input
projection, batch-first encoder stack, mean pooling over time, same MLP
head), plus the training loop (`core/model.py:228-316` -- Adam, MSE,
grad-norm clip 1.0, early stopping with patience and best-state restore).

This container ships no torch, so everything here raises a clear
ImportError at call time unless torch is installed; the grouped Spark ML
edge (ml/forecast.py fit_per_group) keeps its dependency-free
ridge/NumPy-MLP trainers as the default path. On a torch cluster, pass
``trainer=lstm_trainer(...)`` (same (x, y) -> flat-params interface) to
get architecture parity without changing any Spark plumbing.
"""

from __future__ import annotations

import numpy as np

try:
    import torch
    from torch import nn

    TORCH_AVAILABLE = True
except ImportError:  # torch is optional; keep module importable for gates
    torch = None  # type: ignore[assignment]
    nn = None  # type: ignore[assignment]
    TORCH_AVAILABLE = False

CLIP_NORM = 1.0  # core/model.py:244


def train_one_batch(zero_grad, compute_loss, backward, clip_grads, step) -> float:
    """One optimizer step in the reference's order (`core/model.py:252-258`):
    zero grads -> forward/loss -> backward -> grad-norm clip -> step.

    Pure control flow with injected callables so the ORDER (in particular
    clip BETWEEN backward and step -- clipping before backward is a no-op,
    after step is too late) is unit-testable without torch
    (tests/test_torch_loop.py). ``compute_loss`` returns (loss_obj,
    loss_value); the float value is returned for history accumulation."""
    zero_grad()
    loss, loss_value = compute_loss()
    backward(loss)
    clip_grads()
    step()
    return loss_value


def run_training_loop(
    train_epoch,
    epochs: int,
    eval_val=None,
    snapshot=None,
    restore=None,
    patience: int = 10,
) -> dict:
    """Reference epoch loop (`core/model.py:228-316`) as pure control flow:
    early stopping on validation loss with ``patience`` CONSECUTIVE
    non-improvements (strict <, so a tie counts as a stall), best-state
    snapshot on every improvement, and restore of the BEST (not last)
    checkpoint on exit -- including exit by epoch exhaustion, not only by
    early stop. Without a validation set every epoch runs and no restore
    happens. Backend-agnostic so the semantics are pinned by
    tests/test_torch_loop.py even where torch can't run."""
    best_val, stall = float("inf"), 0
    best_state = None
    history: dict = {"train_loss": [], "val_loss": []}
    for _ in range(epochs):
        history["train_loss"].append(train_epoch())
        if eval_val is not None:
            val_loss = eval_val()
            history["val_loss"].append(val_loss)
            if val_loss < best_val:
                best_val, stall = val_loss, 0
                best_state = snapshot()
            else:
                stall += 1
                if stall >= patience:
                    break
    if best_state is not None:
        restore(best_state)
    return history


def _require_torch() -> None:
    if not TORCH_AVAILABLE:
        raise ImportError(
            "torch is not installed; use the ridge/NumPy-MLP trainers in "
            "ml/forecast.py and ml/mlp.py, or install torch for the "
            "LSTM/Transformer path"
        )


def build_lstm(
    lookback: int,
    horizon: int = 24,
    hidden_size: int = 128,
    num_layers: int = 2,
    dropout: float = 0.2,
):
    """LSTM forecaster: (batch, lookback, 1) -> (batch, horizon).

    Reference parity (`core/model.py:44-85`): stacked batch-first LSTM
    (inter-layer dropout only when num_layers > 1), take the final time
    step's output, then Linear(hidden -> hidden//2) + ReLU + Dropout +
    Linear(-> horizon)."""
    _require_torch()

    class LSTMForecaster(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.lstm = nn.LSTM(
                input_size=1,
                hidden_size=hidden_size,
                num_layers=num_layers,
                dropout=dropout if num_layers > 1 else 0.0,
                batch_first=True,
            )
            self.head = nn.Sequential(
                nn.Linear(hidden_size, hidden_size // 2),
                nn.ReLU(),
                nn.Dropout(dropout),
                nn.Linear(hidden_size // 2, horizon),
            )

        def forward(self, x):  # x: (batch, lookback, 1)
            seq_out, _ = self.lstm(x)
            return self.head(seq_out[:, -1, :])

    return LSTMForecaster()


def build_transformer(
    lookback: int,
    horizon: int = 24,
    d_model: int = 128,
    nhead: int = 8,
    num_layers: int = 2,
    dim_feedforward: int = 512,
    dropout: float = 0.2,
):
    """Transformer-encoder forecaster: (batch, lookback, 1) -> (batch, horizon).

    Reference parity (`core/model.py:88-138`): Linear 1 -> d_model input
    projection, batch-first TransformerEncoder stack, mean pooling over
    the time axis, then the same hidden//2 MLP head as the LSTM."""
    _require_torch()

    class TransformerForecaster(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.project = nn.Linear(1, d_model)
            layer = nn.TransformerEncoderLayer(
                d_model=d_model,
                nhead=nhead,
                dim_feedforward=dim_feedforward,
                dropout=dropout,
                batch_first=True,
            )
            self.encoder = nn.TransformerEncoder(layer, num_layers=num_layers)
            self.head = nn.Sequential(
                nn.Linear(d_model, d_model // 2),
                nn.ReLU(),
                nn.Dropout(dropout),
                nn.Linear(d_model // 2, horizon),
            )

        def forward(self, x):  # x: (batch, lookback, 1)
            enc = self.encoder(self.project(x))
            return self.head(enc.mean(dim=1))

    return TransformerForecaster()


def build_model(model_type: str, lookback: int, horizon: int = 24, **kw):
    """Factory matching the reference's model_type switch
    (`core/model.py:159-177`)."""
    if model_type == "lstm":
        return build_lstm(lookback, horizon, **kw)
    if model_type == "transformer":
        return build_transformer(lookback, horizon, **kw)
    raise ValueError(f"unknown model type: {model_type!r}")


def fit(
    model,
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: np.ndarray | None = None,
    y_val: np.ndarray | None = None,
    epochs: int = 50,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    patience: int = 10,
    seed: int = 42,
) -> dict:
    """Reference training loop (`core/model.py:228-316`): Adam + MSE,
    grad-norm clip at 1.0, early stopping on validation loss with
    patience, restore the best checkpoint. Returns a history dict."""
    _require_torch()
    torch.manual_seed(seed)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = model.to(device)
    opt = torch.optim.Adam(model.parameters(), lr=learning_rate)
    loss_fn = nn.MSELoss()

    def tensor3(a: np.ndarray):  # (n, L) -> (n, L, 1)
        return torch.as_tensor(a, dtype=torch.float32, device=device).unsqueeze(-1)

    xt, yt = tensor3(x_train), torch.as_tensor(
        y_train, dtype=torch.float32, device=device
    )
    has_val = x_val is not None and y_val is not None
    if has_val:
        xv, yv = tensor3(x_val), torch.as_tensor(
            y_val, dtype=torch.float32, device=device
        )

    def train_epoch() -> float:
        model.train()
        perm = torch.randperm(len(xt), device=device)
        epoch_loss = 0.0
        for start in range(0, len(xt), batch_size):
            idx = perm[start : start + batch_size]

            def compute_loss():
                loss = loss_fn(model(xt[idx]), yt[idx])
                return loss, float(loss)

            batch_loss = train_one_batch(
                zero_grad=opt.zero_grad,
                compute_loss=compute_loss,
                backward=lambda loss: loss.backward(),
                clip_grads=lambda: nn.utils.clip_grad_norm_(
                    model.parameters(), CLIP_NORM
                ),
                step=opt.step,
            )
            epoch_loss += batch_loss * len(idx)
        return epoch_loss / len(xt)

    def eval_val() -> float:
        model.eval()
        with torch.no_grad():
            return float(loss_fn(model(xv), yv))

    def snapshot():
        return {k: v.detach().clone() for k, v in model.state_dict().items()}

    return run_training_loop(
        train_epoch,
        epochs,
        eval_val=eval_val if has_val else None,
        snapshot=snapshot if has_val else None,
        restore=model.load_state_dict if has_val else None,
        patience=patience,
    )


def predict(model, x: np.ndarray) -> np.ndarray:
    """(n, L) windows -> (n, H) forecasts, eval mode, no grad."""
    _require_torch()
    model.eval()
    device = next(model.parameters()).device
    with torch.no_grad():
        out = model(
            torch.as_tensor(x, dtype=torch.float32, device=device).unsqueeze(-1)
        )
    return out.cpu().numpy()


def torch_trainer(
    model_type: str = "lstm",
    horizon: int = 24,
    epochs: int = 20,
    **build_kw,
):
    """Returns a callable (x[n,L], y[n,H]) -> flat weight vector
    (list[float]) with the same shape contract as the ridge trainer's
    output, so torch-trained parameters flow through the same
    params-as-data parquet persistence. Inference for torch params uses
    :func:`predict` with a rebuilt model (their layout is
    architecture-specific, unlike the ridge (L+1, H) matrix that
    predict_per_group reshapes)."""
    _require_torch()

    def train(x: np.ndarray, y: np.ndarray) -> list[float]:
        model = build_model(model_type, lookback=x.shape[1], horizon=horizon, **build_kw)
        fit(model, x, y, epochs=epochs)
        return np.concatenate(
            [p.detach().cpu().numpy().ravel() for p in model.parameters()]
        ).tolist()

    return train
