"""Server-side optimizer state and updates, vectorized.

Counterpart of the reference's ``include/difacto/updater.h`` (Get/Update/
Load/Save) and ``src/sgd/sgd_updater.h`` :: SGDUpdater. Structural
redesign for TPU:

  * the reference keeps ``unordered_map<feaid_t, SGDEntry>`` with lazily
    allocated variable-length entries (w-only until ``fea_cnt >=
    V_threshold``, then w+V). Hash maps and variable lengths are hostile
    to XLA; we keep dense static tables over the hashed id space and turn
    lazy *allocation* into lazy *activation*: V rows are initialized at
    table creation (uniform(-V_init_scale, +V_init_scale), same as the
    reference's alloc-time init) but contribute to predictions and
    receive updates only once ``cnt >= V_threshold``;
  * updates are applied to the batch's unique rows via gather -> vector
    math -> masked delta scatter-add (deterministic: real uids are unique,
    padded lanes contribute zero deltas);
  * the linear weight uses FTRL-proximal exactly as the reference
    (z/n state, closed-form l1 soft-threshold => exact sparsity), with
    AdaGrad and plain SGD selectable; V uses AdaGrad (or SGD).

Update math (FTRL, reference SGDUpdater::UpdateW):
    n' = n + g^2;  sigma = (sqrt(n') - sqrt(n)) / lr_eta
    z' = z + g - sigma * w
    w' = 0                                   if |z'| <= l1
         -(z' - sign(z')*l1) / ((lr_beta + sqrt(n'))/lr_eta + l2)  otherwise
AdaGrad (reference SGDUpdater::UpdateV):
    g' = g + l2 * v;  n' = n + g'^2;  v' = v - lr_eta * g' / (sqrt(n') + lr_beta)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FMParam


@jax.tree_util.register_dataclass
@dataclass
class FMState:
    """Dense sharded-table state (rows = hashed feature ids).

    V/nV are stored PLANAR ([K, N], factor-major) rather than row-major
    [N, K]: TPU tiling wants the long axis on lanes (128-multiples), and
    the Pallas sweep kernels then see clean (K, R) blocks. Row-major
    views are materialized only for per-batch unique rows (small).
    """

    w: jnp.ndarray     # f32 [N]    linear weights
    z: jnp.ndarray     # f32 [N]    FTRL z (unused for adagrad/sgd w)
    n: jnp.ndarray     # f32 [N]    squared-grad accumulator for w
    V: jnp.ndarray     # f32 [K, N] latent factors (planar)
    nV: jnp.ndarray    # f32 [K, N] squared-grad accumulator for V (planar)
    cnt: jnp.ndarray   # f32 [N]    feature occurrence counts (kFeaCount)

    @property
    def num_rows(self) -> int:
        return self.w.shape[0]

    @property
    def k(self) -> int:
        return self.V.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class PackedFMState:
    """Row-packed state: ONE table [N, 4+2K] with columns w|z|n|cnt|V|nV.

    Why it exists (measured on v5e, BENCH.md round 2): XLA's row-
    structured gathers/scatters move [U, D] blocks at ~5-20 ns/row, while
    the planar layout pays 2 x ~15 ms lane-indexed [K, N] scatters plus
    8 x ~2.5 ms scalar 1D ops per step. Packing turns the entire state
    update into ONE row gather + ONE row scatter-add. Cost: XLA pads the
    minor dim to the 128-lane tile, so the table occupies [N, 128]
    physically — 2 GB at 2^22, fine to ~2^24; planar remains the layout
    for huge tables and for the Pallas sweep kernels.
    """

    tbl: jnp.ndarray   # f32 [N, 4+2K]

    @property
    def num_rows(self) -> int:
        return self.tbl.shape[0]

    @property
    def k(self) -> int:
        return (self.tbl.shape[1] - 4) // 2


def pack_state(state: FMState) -> PackedFMState:
    """FMState (planar) -> PackedFMState. jit-traceable."""
    cols = [state.w[:, None], state.z[:, None], state.n[:, None],
            state.cnt[:, None], state.V.T, state.nV.T]
    return PackedFMState(tbl=jnp.concatenate(cols, axis=1))


def unpack_state(packed: PackedFMState) -> FMState:
    """PackedFMState -> FMState (planar). jit-traceable."""
    t = packed.tbl
    k = packed.k
    return FMState(
        w=t[:, 0], z=t[:, 1], n=t[:, 2], cnt=t[:, 3],
        V=t[:, 4 : 4 + k].T, nV=t[:, 4 + k :].T,
    )


class FMUpdater:
    """Functional updater: all methods are pure (state in, state out) and
    jit-traceable; ``param`` values are compile-time constants. Every
    method accepts either layout (FMState planar / PackedFMState)."""

    def __init__(self, param: FMParam):
        self.param = param

    # -- creation / io ------------------------------------------------------

    def init_state(self, num_rows: int, seed: int = 0) -> FMState:
        p = self.param
        k = p.V_dim
        key = jax.random.PRNGKey(seed)
        V = (
            jax.random.uniform(key, (k, num_rows), jnp.float32, -1.0, 1.0)
            * p.V_init_scale
            if k > 0
            else jnp.zeros((0, num_rows), jnp.float32)
        )
        def zeros():
            # distinct buffers: donation forbids aliased arguments
            return jnp.zeros(num_rows, jnp.float32)

        return FMState(
            w=zeros(), z=zeros(), n=zeros(), V=V, nV=jnp.zeros_like(V), cnt=zeros()
        )

    def init_state_packed(self, num_rows: int, seed: int = 0) -> PackedFMState:
        return pack_state(self.init_state(num_rows, seed))

    # -- Get (reference: SGDUpdater::Get) -----------------------------------

    def pull(self, state, uids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Materialize rows [U, 1+K]: w then V. V is zero until activated
        (cnt >= V_threshold), matching the reference's absent-entry
        semantics; invalid (padded) lanes are fully zero."""
        if isinstance(state, PackedFMState):
            return self._pull_packed(state, uids, valid)
        idx = jnp.where(valid, uids, 0)
        v = valid.astype(jnp.float32)
        w = state.w[idx] * v
        active = self._active(state, idx, valid)
        V = state.V[:, idx].T * active[:, None].astype(jnp.float32)
        return jnp.concatenate([w[:, None], V], axis=1)

    def _pull_packed(self, state: PackedFMState, uids, valid) -> jnp.ndarray:
        p = self.param
        k = p.V_dim
        idx = jnp.where(valid, uids, 0)
        rows = state.tbl[idx]  # ONE row gather
        w = rows[:, 0] * valid.astype(jnp.float32)
        if k == 0:
            return w[:, None]
        active = valid & (rows[:, 3] >= p.V_threshold)
        V = rows[:, 4 : 4 + k] * active[:, None].astype(jnp.float32)
        return jnp.concatenate([w[:, None], V], axis=1)

    def _active(self, state: FMState, uids, valid):
        p = self.param
        a = valid
        if p.V_dim > 0:
            a = a & (state.cnt[uids] >= p.V_threshold)
        return a

    def _trainable_w(self, state: FMState, uids, valid):
        p = self.param
        t = valid
        if p.tail_feature_filter > 0:
            t = t & (state.cnt[uids] >= p.tail_feature_filter)
        return t

    # -- Update (reference: SGDUpdater::Update) -----------------------------

    def update(
        self,
        state,
        uids: jnp.ndarray,     # i32 [U] unique table rows (clamped, sorted)
        grads: jnp.ndarray,    # f32 [U, 1+K] per-key aggregated gradients
        add_cnt: jnp.ndarray,  # f32 [U] batch occurrence counts
        valid: jnp.ndarray,    # bool [U]
    ):
        if isinstance(state, PackedFMState):
            return self._update_packed(state, uids, grads, add_cnt, valid)
        p = self.param
        uids = jnp.where(valid, uids, 0)  # clamp sentinel lanes; deltas masked
        g = grads[:, 0]
        w_u = state.w[uids]
        n_u = state.n[uids]
        upd_w = self._trainable_w(state, uids, valid)

        if p.w_updater == "ftrl":
            z_u = state.z[uids]
            n_new = n_u + g * g
            sigma = (jnp.sqrt(n_new) - jnp.sqrt(n_u)) / p.lr_eta
            z_new = z_u + g - sigma * w_u
            w_new = jnp.where(
                jnp.abs(z_new) <= p.l1,
                0.0,
                -(z_new - jnp.sign(z_new) * p.l1)
                / ((p.lr_beta + jnp.sqrt(n_new)) / p.lr_eta + p.l2),
            )
        elif p.w_updater == "adagrad":
            g_r = g + p.l2 * w_u
            z_new = state.z[uids]
            n_new = n_u + g_r * g_r
            w_new = w_u - p.lr_eta * g_r / (jnp.sqrt(n_new) + p.lr_beta)
        else:  # sgd
            z_new = state.z[uids]
            n_new = n_u
            w_new = w_u - p.lr_eta * (g + p.l2 * w_u)

        m = upd_w.astype(jnp.float32)
        state = FMState(
            w=state.w.at[uids].add(m * (w_new - w_u)),
            z=state.z.at[uids].add(m * (z_new - state.z[uids])),
            n=state.n.at[uids].add(m * (n_new - n_u)),
            V=state.V,
            nV=state.nV,
            cnt=state.cnt.at[uids].add(valid.astype(jnp.float32) * add_cnt),
        )

        if p.V_dim > 0:
            # activation gate uses the PRE-update count (a row crossing the
            # threshold this batch gets its first V update next batch, like
            # the reference, whose first post-allocation pull sees init V).
            cnt_pre = state.cnt[uids] - valid.astype(jnp.float32) * add_cnt
            active = valid & (cnt_pre >= p.V_threshold)
            if p.tail_feature_filter > 0:
                active = active & (cnt_pre >= p.tail_feature_filter)
            gV = grads[:, 1:].T            # planar [K, U]
            V_u = state.V[:, uids]
            nV_u = state.nV[:, uids]
            if p.V_updater == "adagrad":
                gV_r = gV + p.V_l2 * V_u
                nV_new = nV_u + gV_r * gV_r
                V_new = V_u - p.V_lr_eta * gV_r / (jnp.sqrt(nV_new) + p.V_lr_beta)
            else:  # sgd
                nV_new = nV_u
                V_new = V_u - p.V_lr_eta * (gV + p.V_l2 * V_u)
            mV = active[None, :].astype(jnp.float32)
            state = FMState(
                w=state.w,
                z=state.z,
                n=state.n,
                V=state.V.at[:, uids].add(mV * (V_new - V_u)),
                nV=state.nV.at[:, uids].add(mV * (nV_new - nV_u)),
                cnt=state.cnt,
            )
        return state

    def _update_packed(self, state, uids, grads, add_cnt, valid):
        """Same math/masking as the planar update, as ONE row gather +
        ONE row scatter-add of masked deltas (see PackedFMState)."""
        p = self.param
        k = p.V_dim
        uids = jnp.where(valid, uids, 0)
        rows = state.tbl[uids]  # [U, 4+2K]
        w, z, n, cnt = rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]
        g = grads[:, 0]
        upd_w = valid
        if p.tail_feature_filter > 0:
            upd_w = upd_w & (cnt >= p.tail_feature_filter)

        if p.w_updater == "ftrl":
            n_new = n + g * g
            sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / p.lr_eta
            z_new = z + g - sigma * w
            w_new = jnp.where(
                jnp.abs(z_new) <= p.l1,
                0.0,
                -(z_new - jnp.sign(z_new) * p.l1)
                / ((p.lr_beta + jnp.sqrt(n_new)) / p.lr_eta + p.l2),
            )
        elif p.w_updater == "adagrad":
            g_r = g + p.l2 * w
            z_new = z
            n_new = n + g_r * g_r
            w_new = w - p.lr_eta * g_r / (jnp.sqrt(n_new) + p.lr_beta)
        else:  # sgd
            z_new = z
            n_new = n
            w_new = w - p.lr_eta * (g + p.l2 * w)

        m = upd_w.astype(jnp.float32)
        parts = [
            (m * (w_new - w))[:, None],
            (m * (z_new - z))[:, None],
            (m * (n_new - n))[:, None],
            (valid.astype(jnp.float32) * add_cnt)[:, None],
        ]
        if k > 0:
            # activation gates on the PRE-update count, like the planar path
            V = rows[:, 4 : 4 + k]
            nV = rows[:, 4 + k :]
            active = valid & (cnt >= p.V_threshold)
            if p.tail_feature_filter > 0:
                active = active & (cnt >= p.tail_feature_filter)
            gV = grads[:, 1:]
            if p.V_updater == "adagrad":
                gV_r = gV + p.V_l2 * V
                nV_new = nV + gV_r * gV_r
                V_new = V - p.V_lr_eta * gV_r / (jnp.sqrt(nV_new) + p.V_lr_beta)
            else:  # sgd
                nV_new = nV
                V_new = V - p.V_lr_eta * (gV + p.V_l2 * V)
            mV = active[:, None].astype(jnp.float32)
            parts += [mV * (V_new - V), mV * (nV_new - nV)]
        delta = jnp.concatenate(parts, axis=1)
        return PackedFMState(tbl=state.tbl.at[uids].add(delta))

    # -- feature counts (reference: the kFeaCount push) ----------------------

    def add_counts(self, state, idx: jnp.ndarray, amounts: jnp.ndarray):
        """state.cnt[idx] += amounts, either layout. idx must be in-range
        (clamped); amounts 0 for masked lanes."""
        if isinstance(state, PackedFMState):
            d = state.tbl.shape[1]
            delta = jnp.zeros((idx.shape[0], d), jnp.float32)
            delta = delta.at[:, 3].set(amounts)
            return PackedFMState(tbl=state.tbl.at[idx].add(delta))
        return dataclasses.replace(state, cnt=state.cnt.at[idx].add(amounts))

    # -- observability ------------------------------------------------------

    def stats(self, state) -> dict[str, jnp.ndarray]:
        """nnz(w) / active-V counts (the capacity observables the reference
        prints in Progress rows)."""
        if isinstance(state, PackedFMState):
            w, cnt = state.tbl[:, 0], state.tbl[:, 3]
        else:
            w, cnt = state.w, state.cnt
        out = {"nnz_w": jnp.sum(w != 0).astype(jnp.float32)}
        if self.param.V_dim > 0:
            out["nnz_V"] = jnp.sum(cnt >= self.param.V_threshold).astype(
                jnp.float32
            )
        else:
            out["nnz_V"] = jnp.zeros((), jnp.float32)
        return out
