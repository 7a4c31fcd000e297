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


@jax.tree_util.register_dataclass
@dataclass
class StackedFMState:
    """Sublane-stacked state: ONE table [4+2K, N], rows w|z|n|cnt|V|nV.

    The big-table layout (measured at 2^26/K=16, scripts/hw_scatter_*):
    XLA TPU scatters cost per-INDEX (a serial loop: ~23 ns/index + ~6 ns
    per extra strided lane — table-size independent, NOT bandwidth), so
    six planar scatters pay 6 index loops (~42 ms at U=131k) while ONE
    [4+2K, N] scatter pays one (~20 ms); the update gather likewise
    drops to one. Physical cost: the sublane dim pads to a multiple of
    8 (36 -> 40 at K=16, +11% HBM) — nothing like PackedFMState's
    128-lane row pad (which is why packed stops at ~2^24). Row-window
    "super-row" layouts measured WORSE (43 ms: per-index cost scales
    with window lanes; hw_rowwin_probe.py) and 2-D window gathers are
    pathological (256 ms). Requires kernel=xla (the Pallas table
    kernels address planar [K, N] blocks).
    """

    tbl: jnp.ndarray   # f32 [4+2K, N]

    @property
    def num_rows(self) -> int:
        return self.tbl.shape[1]

    @property
    def k(self) -> int:
        return (self.tbl.shape[0] - 4) // 2


@jax.tree_util.register_dataclass
@dataclass
class HotColdFMState:
    """Frequency-split stacked state: TWO tables [4+2K, H] + [4+2K, N-H].

    Why (measured, scripts/hw_scatter_cliff.py, v5e): the XLA TPU
    scatter-add's per-index serial-loop cost drops ~7x (156 -> 22
    ns/index for 36 strided lanes) once the TARGET table is small enough
    (~2^18 rows at K=16 — a VMEM-sized working set), and power-law CTR
    data concentrates ~2/3 of every batch's unique ids in the hottest
    ~2^18 rows. A host-side frequency remap (data/remap.py) relabels
    rows so the hot head occupies [0, H); prep then splits each batch's
    sorted uniques into a hot-prefix bucket and a cold-suffix bucket, so
    the expensive big-table scatter/gather only sees the cold MINORITY.
    The remap is pure per-run layout: checkpoints stay in canonical
    hash-row space (utils/checkpoint.py applies the permutation on the
    host), so a remapped run round-trips with any other store/layout.

    Counterpart of the reference's cache-conscious server-side update
    (SURVEY §2.1 SGD updater: the unordered_map touches hot entries in
    cache by construction; dense TPU tables need the explicit split).
    """

    hot: jnp.ndarray   # f32 [4+2K, H]   remapped rows [0, H)
    cold: jnp.ndarray  # f32 [4+2K, N-H] remapped rows [H, N) at uid - H

    @property
    def num_rows(self) -> int:
        return self.hot.shape[1] + self.cold.shape[1]

    @property
    def hot_rows(self) -> int:
        return self.hot.shape[1]

    @property
    def k(self) -> int:
        return (self.hot.shape[0] - 4) // 2


# gather/scatter index metadata (see scripts/hw_scatter_scaling.py: the
# flags shave ~10% and mode=fill/drop removes the sentinel clamp): prep
# and device localize both produce SORTED-UNIQUE uids whose pad lanes
# carry the out-of-range sentinel num_rows, so fill-0 gathers and drop
# scatters are exact. Callers that can't promise this (the sharded
# store's unsorted receive stream) pass sorted_unique=False.
_GKW = dict(indices_are_sorted=True, unique_indices=True,
            mode="fill", fill_value=0)
_SKW = dict(indices_are_sorted=True, unique_indices=True, mode="drop")


def pack_state(state: FMState) -> PackedFMState:
    """FMState (planar) -> PackedFMState. jit-traceable."""
    cols = [state.w[:, None], state.z[:, None], state.n[:, None],
            state.cnt[:, None], state.V.T, state.nV.T]
    return PackedFMState(tbl=jnp.concatenate(cols, axis=1))


def stack_state(state: FMState) -> StackedFMState:
    """FMState (planar) -> StackedFMState. jit-traceable."""
    rows = [state.w[None], state.z[None], state.n[None],
            state.cnt[None], state.V, state.nV]
    return StackedFMState(tbl=jnp.concatenate(rows, axis=0))


def unstack_state(stacked: StackedFMState) -> FMState:
    """StackedFMState -> FMState (planar). jit-traceable."""
    t = stacked.tbl
    k = stacked.k
    return FMState(
        w=t[0], z=t[1], n=t[2], cnt=t[3],
        V=t[4 : 4 + k], nV=t[4 + k :],
    )


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

    def init_state_stacked(self, num_rows: int, seed: int = 0) -> StackedFMState:
        """Bit-identical to ``stack_state(init_state(...))`` but built
        low-peak: materializing the planar state and concatenating holds
        ~2.1x the table transiently (OOMs a 2^26 table on one 16 GB
        chip); here the [D, N] table is allocated once and V is written
        in with a donated in-place dynamic-update-slice."""
        p = self.param
        k = p.V_dim
        tbl = jax.jit(
            lambda: jnp.zeros((4 + 2 * k, num_rows), jnp.float32)
        )()
        if k > 0:
            def setv(t):
                key = jax.random.PRNGKey(seed)
                V = (
                    jax.random.uniform(key, (k, num_rows), jnp.float32,
                                       -1.0, 1.0)
                    * p.V_init_scale
                )
                return jax.lax.dynamic_update_slice(t, V, (4, 0))

            tbl = jax.jit(setv, donate_argnums=0)(tbl)
        return StackedFMState(tbl=tbl)

    def init_state_hotcold(
        self, num_rows: int, hot_rows: int, seed: int = 0
    ) -> HotColdFMState:
        """Fresh frequency-split state (see HotColdFMState). Row r of the
        logical [D, num_rows] table lives in ``hot[:, r]`` when r <
        hot_rows, else ``cold[:, r - hot_rows]``; V init is per-table
        (the remap permutes rows anyway, so iid init is iid init)."""
        assert 0 < hot_rows < num_rows
        p = self.param
        k = p.V_dim

        def mk(n, sub):
            tbl = jax.jit(
                lambda: jnp.zeros((4 + 2 * k, n), jnp.float32)
            )()
            if k > 0:
                def setv(t):
                    key = jax.random.fold_in(jax.random.PRNGKey(seed), sub)
                    V = (
                        jax.random.uniform(key, (k, n), jnp.float32,
                                           -1.0, 1.0)
                        * p.V_init_scale
                    )
                    return jax.lax.dynamic_update_slice(t, V, (4, 0))

                tbl = jax.jit(setv, donate_argnums=0)(tbl)
            return tbl

        return HotColdFMState(
            hot=mk(hot_rows, 0), cold=mk(num_rows - hot_rows, 1)
        )

    def pull_raw_split(
        self, state: HotColdFMState, uids_h: jnp.ndarray,
        uids_c: jnp.ndarray,
    ) -> jnp.ndarray:
        """[D, Ch+Cc] raw rows from the split tables: the hot-prefix
        bucket gathers the (cheap) small table, the cold bucket the big
        one. Both buckets are sorted-unique with OOB sentinels (hot pad =
        hot_rows, cold pad = num_rows), so fill-0 gathers are exact —
        and the big-table gather only pays per-index cost for the cold
        MINORITY (the whole point; scripts/hw_scatter_cliff.py)."""
        H = state.hot_rows
        rh = state.hot.at[:, uids_h].get(**_GKW)
        rc = state.cold.at[:, uids_c - H].get(**_GKW)
        return jnp.concatenate([rh, rc], axis=1)

    def update_split(
        self, state: HotColdFMState, uids_h, uids_c, grads, add_cnt,
        valid, rows: jnp.ndarray,
    ) -> HotColdFMState:
        """The stacked update as TWO drop-mode scatter-adds over the
        split tables. ``rows`` is the step's shared pull_raw_split
        output (positions [0, Ch) hot, [Ch, Ch+Cc) cold — static
        slices, no repacking)."""
        H = state.hot_rows
        ch = uids_h.shape[0]
        delta = self._stacked_delta(rows, grads, add_cnt, valid)
        return HotColdFMState(
            hot=state.hot.at[:, uids_h].add(delta[:, :ch], **_SKW),
            cold=state.cold.at[:, uids_c - H].add(delta[:, ch:], **_SKW),
        )

    # -- Get (reference: SGDUpdater::Get) -----------------------------------

    def pull(
        self, state, uids: jnp.ndarray, valid: jnp.ndarray,
        sorted_unique: bool = False,
    ) -> jnp.ndarray:
        """Materialize rows [U, 1+K]: w then V. V is zero until activated
        (cnt >= V_threshold), matching the reference's absent-entry
        semantics; invalid (padded) lanes are fully zero.

        ``sorted_unique``: promise that uids are sorted, unique, with
        out-of-range sentinels on pad lanes — gathers then carry
        indices_are_sorted/unique_indices and fill 0 instead of clamping
        (measured ~10% faster at 2^26; scripts/hw_layout26.py)."""
        if isinstance(state, StackedFMState):
            return self._pull_stacked(state, uids, valid, sorted_unique)
        if isinstance(state, PackedFMState):
            return self._pull_packed(state, uids, valid)
        if sorted_unique:
            v = valid.astype(jnp.float32)
            w = state.w.at[uids].get(**_GKW) * v
            active = valid
            if self.param.V_dim > 0:
                active = active & (
                    state.cnt.at[uids].get(**_GKW) >= self.param.V_threshold
                )
            V = state.V.at[:, uids].get(**_GKW).T
            V = V * active[:, None].astype(jnp.float32)
            return jnp.concatenate([w[:, None], V], axis=1)
        idx = jnp.where(valid, uids, 0)
        v = valid.astype(jnp.float32)
        w = state.w[idx] * v
        active = self._active(state, idx, valid)
        V = state.V[:, idx].T * active[:, None].astype(jnp.float32)
        return jnp.concatenate([w[:, None], V], axis=1)

    def _pull_stacked(self, state: StackedFMState, uids, valid,
                      sorted_unique: bool) -> jnp.ndarray:
        rows = self.pull_raw(state, uids, valid, sorted_unique)
        return self.rows_view(rows, valid)

    def pull_raw(self, state: StackedFMState, uids, valid,
                 sorted_unique: bool = False) -> jnp.ndarray:
        """The stacked layout's ONE [D, U] table gather — shared between
        pull and update by the train step (a second full-row gather
        costs ~7 ms at 2^26/U=131k; see LocalStore._prepped_step_sorted)."""
        if sorted_unique:
            return state.tbl.at[:, uids].get(**_GKW)
        return state.tbl[:, jnp.where(valid, uids, 0)]

    def rows_view(self, rows: jnp.ndarray, valid) -> jnp.ndarray:
        """pull_raw [D, U] -> the worker-facing [U, 1+K] (w | gated V)."""
        p = self.param
        k = p.V_dim
        w = rows[0] * valid.astype(jnp.float32)
        if k == 0:
            return w[:, None]
        active = valid & (rows[3] >= p.V_threshold)
        V = rows[4 : 4 + k].T * active[:, None].astype(jnp.float32)
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
        sorted_unique: bool = False,
        rows: jnp.ndarray | None = None,  # stacked only: pre-gathered
                               # pull_raw [D, U] (skips the 2nd gather)
    ):
        if isinstance(state, StackedFMState):
            return self._update_stacked(state, uids, grads, add_cnt, valid,
                                        sorted_unique, rows)
        if isinstance(state, PackedFMState):
            return self._update_packed(state, uids, grads, add_cnt, valid,
                                       sorted_unique)
        p = self.param
        if sorted_unique:
            g1 = lambda a: a.at[uids].get(**_GKW)
            s1 = lambda a, d: a.at[uids].add(d, **_SKW)
            gl = lambda a: a.at[:, uids].get(**_GKW)
            sl = lambda a, d: a.at[:, uids].add(d, **_SKW)
        else:
            uids = jnp.where(valid, uids, 0)  # clamp sentinels; deltas masked
            g1 = lambda a: a[uids]
            s1 = lambda a, d: a.at[uids].add(d)
            gl = lambda a: a[:, uids]
            sl = lambda a, d: a.at[:, uids].add(d)
        g = grads[:, 0]
        w_u = g1(state.w)
        n_u = g1(state.n)
        cnt_pre = g1(state.cnt)
        upd_w = valid
        if p.tail_feature_filter > 0:
            upd_w = upd_w & (cnt_pre >= p.tail_feature_filter)

        skip_z = skip_n = False
        if p.w_updater == "ftrl":
            z_u = g1(state.z)
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
            z_u = z_new = None
            skip_z = True  # z untouched: skip its ~per-index scatter loop
            n_new = n_u + g_r * g_r
            w_new = w_u - p.lr_eta * g_r / (jnp.sqrt(n_new) + p.lr_beta)
        else:  # sgd
            z_u = z_new = None
            skip_z = skip_n = True  # n untouched too
            n_new = n_u
            w_new = w_u - p.lr_eta * (g + p.l2 * w_u)

        m = upd_w.astype(jnp.float32)
        state = FMState(
            w=s1(state.w, m * (w_new - w_u)),
            z=state.z if skip_z else s1(state.z, m * (z_new - z_u)),
            n=state.n if skip_n else s1(state.n, m * (n_new - n_u)),
            V=state.V,
            nV=state.nV,
            cnt=s1(state.cnt, valid.astype(jnp.float32) * add_cnt),
        )

        if p.V_dim > 0:
            # activation gate uses the PRE-update count (a row crossing the
            # threshold this batch gets its first V update next batch, like
            # the reference, whose first post-allocation pull sees init V).
            active = valid & (cnt_pre >= p.V_threshold)
            if p.tail_feature_filter > 0:
                active = active & (cnt_pre >= p.tail_feature_filter)
            gV = grads[:, 1:].T            # planar [K, U]
            V_u = gl(state.V)
            mV = active[None, :].astype(jnp.float32)
            if p.V_updater == "adagrad":
                nV_u = gl(state.nV)
                gV_r = gV + p.V_l2 * V_u
                nV_new = nV_u + gV_r * gV_r
                V_new = V_u - p.V_lr_eta * gV_r / (jnp.sqrt(nV_new) + p.V_lr_beta)
                nV_out = sl(state.nV, mV * (nV_new - nV_u))
            else:  # sgd: nV untouched — skip its scatter
                V_new = V_u - p.V_lr_eta * (gV + p.V_l2 * V_u)
                nV_out = state.nV
            state = FMState(
                w=state.w,
                z=state.z,
                n=state.n,
                V=sl(state.V, mV * (V_new - V_u)),
                nV=nV_out,
                cnt=state.cnt,
            )
        return state

    def _update_stacked(self, state, uids, grads, add_cnt, valid,
                        sorted_unique: bool, rows=None):
        """Same math/masking as the planar update, as ONE [D, U] gather +
        ONE [D, U] scatter-add of masked deltas (see StackedFMState —
        scatter cost is per-index, so one index loop instead of six).
        ``rows``: the step's pull_raw result, when the caller shares it."""
        if sorted_unique:
            if rows is None:
                rows = state.tbl.at[:, uids].get(**_GKW)
            skw = _SKW
        else:
            uids = jnp.where(valid, uids, 0)
            if rows is None:
                rows = state.tbl[:, uids]
            skw = {}
        delta = self._stacked_delta(rows, grads, add_cnt, valid)
        return StackedFMState(tbl=state.tbl.at[:, uids].add(delta, **skw))

    def _stacked_delta(self, rows, grads, add_cnt, valid) -> jnp.ndarray:
        """The [D, U] masked state delta for sublane-stacked layouts
        (StackedFMState / HotColdFMState) from the pre-gathered rows —
        identical math/masking to the planar update."""
        p = self.param
        k = p.V_dim
        w, z, n, cnt = rows[0], rows[1], rows[2], rows[3]
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
            (m * (w_new - w))[None],
            (m * (z_new - z))[None],
            (m * (n_new - n))[None],
            (valid.astype(jnp.float32) * add_cnt)[None],
        ]
        if k > 0:
            # activation gates on the PRE-update count, like the planar path
            V = rows[4 : 4 + k]
            nV = rows[4 + k :]
            active = valid & (cnt >= p.V_threshold)
            if p.tail_feature_filter > 0:
                active = active & (cnt >= p.tail_feature_filter)
            gV = grads[:, 1:].T
            if p.V_updater == "adagrad":
                gV_r = gV + p.V_l2 * V
                nV_new = nV + gV_r * gV_r
                V_new = V - p.V_lr_eta * gV_r / (jnp.sqrt(nV_new) + p.V_lr_beta)
            else:  # sgd
                nV_new = nV
                V_new = V - p.V_lr_eta * (gV + p.V_l2 * V)
            mV = active[None, :].astype(jnp.float32)
            parts += [mV * (V_new - V), mV * (nV_new - nV)]
        return jnp.concatenate(parts, axis=0)

    def _update_packed(self, state, uids, grads, add_cnt, valid,
                       sorted_unique: bool = False):
        """Same math/masking as the planar update, as ONE row gather +
        ONE row scatter-add of masked deltas (see PackedFMState)."""
        p = self.param
        k = p.V_dim
        if sorted_unique:
            rows = state.tbl.at[uids].get(**_GKW)  # [U, 4+2K]
        else:
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
        if sorted_unique:
            return PackedFMState(tbl=state.tbl.at[uids].add(delta, **_SKW))
        return PackedFMState(tbl=state.tbl.at[uids].add(delta))

    # -- feature counts (reference: the kFeaCount push) ----------------------

    def add_counts(self, state, idx: jnp.ndarray, amounts: jnp.ndarray):
        """state.cnt[idx] += amounts, either layout. idx must be in-range
        (clamped); amounts 0 for masked lanes."""
        if isinstance(state, HotColdFMState):
            H = state.hot_rows
            return HotColdFMState(
                # drop mode routes each index to its own table (idx >= H
                # is OOB for hot; idx - H < 0 is OOB for cold)
                hot=state.hot.at[3, idx].add(amounts, mode="drop"),
                cold=state.cold.at[3, idx - H].add(amounts, mode="drop"),
            )
        if isinstance(state, StackedFMState):
            return StackedFMState(
                tbl=state.tbl.at[3, idx].add(amounts)
            )
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
        if isinstance(state, HotColdFMState):
            # summed per table (a [N] concat would materialize copies)
            out = {
                "nnz_w": (jnp.sum(state.hot[0] != 0)
                          + jnp.sum(state.cold[0] != 0)).astype(jnp.float32)
            }
            if self.param.V_dim > 0:
                t = self.param.V_threshold
                out["nnz_V"] = (
                    jnp.sum(state.hot[3] >= t) + jnp.sum(state.cold[3] >= t)
                ).astype(jnp.float32)
            else:
                out["nnz_V"] = jnp.zeros((), jnp.float32)
            return out
        if isinstance(state, StackedFMState):
            w, cnt = state.tbl[0], state.tbl[3]
        elif isinstance(state, PackedFMState):
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
