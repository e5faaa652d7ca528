"""Loss functions: BCE / focal / smoothing / routing regularizers / fairness.

Parity targets in the reference:
  * BCE with pos_weight + label smoothing — flagship main.py:3092-3126 and
    the clamped pos_weight of PhenoModel PCA main.py:2449-2459.
  * death-logit trick logits[:,1]-logits[:,0] — main.py:3092.
  * focal BCE — MortModel/Baseline/main:51 (focal_bce_with_logits).
  * routing entropy bonus / uniform penalty — main.py:3107-3126.
  * EDDI fairness — Model/train_step3_trimodal_router.py:52-80.
  * soft equalized-odds — train_fame.py:76-112.

All losses compute in fp32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _as_f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    pos_weight: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    sample_weight: Optional[jnp.ndarray] = None,
    reduce: bool = True,
) -> jnp.ndarray:
    """Binary cross-entropy over logits with optional per-label pos_weight
    and label smoothing y' = y(1-s) + 0.5*s."""
    logits, targets = _as_f32(logits, targets)
    if label_smoothing > 0.0:
        targets = targets * (1.0 - label_smoothing) + 0.5 * label_smoothing
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|)), with pos weighting
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pos_term = -targets * log_p
    if pos_weight is not None:
        pos_term = pos_term * pos_weight.astype(jnp.float32)
    loss = pos_term - (1.0 - targets) * log_not_p
    if sample_weight is not None:
        loss = loss * sample_weight.astype(jnp.float32)[..., None] if loss.ndim > sample_weight.ndim else loss * sample_weight.astype(jnp.float32)
    return jnp.mean(loss) if reduce else loss


def focal_bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reduce: bool = True,
) -> jnp.ndarray:
    logits, targets = _as_f32(logits, targets)
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits) + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    return jnp.mean(loss) if reduce else loss


def focal_pos_weight_bce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    gamma: float = 2.0,
    pos_weight: Optional[jnp.ndarray] = None,
    reduce: bool = True,
) -> jnp.ndarray:
    """Focal loss as the unimodal drivers define it (02_BEHRT.py:23-42 /
    01_BioClinicalBert.py FocalLoss): pos_weight-ed BCE x (1 - p_t)^gamma,
    with NO alpha balancing term."""
    logits, targets = _as_f32(logits, targets)
    bce = bce_with_logits(logits, targets, pos_weight=pos_weight, reduce=False)
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = (1 - p_t) ** gamma * bce
    return jnp.mean(loss) if reduce else loss


def death_logit(logits: jnp.ndarray) -> jnp.ndarray:
    """2-class capsule logits -> single mortality logit (main.py:3092)."""
    return logits[:, 1] - logits[:, 0]


def clamped_pos_weight(y: jnp.ndarray, lo: float = 0.1, hi: float = 5.0) -> jnp.ndarray:
    """Per-label neg/pos ratio clamped to [lo, hi] (PhenoModel PCA :2449)."""
    y = y.astype(jnp.float32)
    pos = jnp.clip(jnp.sum(y, axis=0), 1.0, None)
    neg = jnp.clip(jnp.sum(1.0 - y, axis=0), 1.0, None)
    return jnp.clip(neg / pos, lo, hi)


def routing_regularizers(
    r_matrix: jnp.ndarray,  # [B,R,K]
    route_mask: Optional[jnp.ndarray] = None,  # [B,R]
    *,
    entropy_bonus: float = 0.0,
    uniform_penalty: float = 0.0,
) -> jnp.ndarray:
    """Entropy bonus (reward diverse routing) and uniformity penalty
    (punish exactly-uniform collapse). Reference main.py:3107-3126."""
    if entropy_bonus == 0.0 and uniform_penalty == 0.0:
        return jnp.asarray(0.0, jnp.float32)
    r = jnp.clip(r_matrix.astype(jnp.float32), 1e-9, 1.0)
    loss = jnp.asarray(0.0, jnp.float32)
    if entropy_bonus:
        ent = -jnp.sum(r * jnp.log(r), axis=1)  # [B,K]
        loss = loss - entropy_bonus * jnp.mean(ent)
    if uniform_penalty:
        if route_mask is not None:
            n_avail = jnp.clip(jnp.sum(route_mask, axis=1, keepdims=True), 1.0, None)[..., None]
        else:
            n_avail = r.shape[1]
        uniform = 1.0 / n_avail
        loss = loss + uniform_penalty * jnp.mean(jnp.sum((r - uniform) ** 2, axis=1))
    return loss


def eddi_loss(
    probs: jnp.ndarray,  # [B] predicted probabilities
    targets: jnp.ndarray,  # [B]
    groups: jnp.ndarray,  # [B] int group ids
    num_groups: int = 2,
) -> jnp.ndarray:
    """Differentiable EDDI: mean absolute deviation of per-group mean error
    from the overall mean error (Model/train_step3:52-80)."""
    probs, targets = _as_f32(probs, targets)
    err = jnp.abs(probs - targets)
    overall = jnp.mean(err)
    total = jnp.asarray(0.0, jnp.float32)
    count = jnp.asarray(0.0, jnp.float32)
    for g in range(num_groups):
        m = (groups == g).astype(jnp.float32)
        n = jnp.sum(m)
        gerr = jnp.sum(err * m) / jnp.clip(n, 1.0, None)
        has = (n > 0).astype(jnp.float32)
        total = total + has * jnp.abs(gerr - overall)
        count = count + has
    return total / jnp.clip(count, 1.0, None)


def soft_eq_odds_loss(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    groups: jnp.ndarray,
    num_groups: int = 2,
) -> jnp.ndarray:
    """Soft equalized-odds: squared gaps of group-conditional mean scores
    among positives (TPR proxy) and negatives (FPR proxy)
    (train_fame.py:76-112)."""
    probs, targets = _as_f32(probs, targets)
    loss = jnp.asarray(0.0, jnp.float32)
    for y_val, sel in ((1.0, targets), (0.0, 1.0 - targets)):
        rates = []
        valid = []
        for g in range(num_groups):
            m = (groups == g).astype(jnp.float32) * sel
            n = jnp.sum(m)
            rates.append(jnp.sum(probs * m) / jnp.clip(n, 1.0, None))
            valid.append((n > 0).astype(jnp.float32))
        for i in range(num_groups):
            for j in range(i + 1, num_groups):
                loss = loss + valid[i] * valid[j] * (rates[i] - rates[j]) ** 2
    return loss


def ce_two_class(
    logits: jnp.ndarray, targets: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """2-class cross-entropy with smoothing (MortModel/main.py loss)."""
    logits, targets = _as_f32(logits, targets)
    onehot = jnp.stack([1.0 - targets, targets], axis=1)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + 0.5 * label_smoothing
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=1))
