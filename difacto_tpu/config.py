"""Typed configuration.

TPU-native counterpart of the reference's dmlc::Parameter structs
(``src/sgd/sgd_param.h`` :: SGDLearnerParam / SGDUpdaterParam,
``src/bcd/bcd_param.h``) plus the ``key = val`` config-file convention of
``src/common/arg_parser.h``. Field names mirror the reference so its
configs translate 1:1; TPU-specific knobs (hash bits, padding, mesh) are
additions with no reference counterpart.

Each dataclass consumes the keys it knows from a kwargs list and returns
the leftovers, mirroring difacto's hierarchical ``Init(kwargs)`` protocol
(unknown keys at top level are fatal, as in ``src/difacto.cc``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

from .base import KWArgs


def _coerce(val: str, typ: Any) -> Any:
    if typ is bool:
        return val.lower() in ("1", "true", "yes", "on")
    if typ is int:
        return int(val)
    if typ is float:
        return float(val)
    return val


@dataclass
class ParamBase:
    """dmlc::Parameter-style: init from kwargs, return unconsumed pairs."""

    def init(self, kwargs: KWArgs) -> KWArgs:
        names = {f.name: f for f in dataclasses.fields(self)}
        rest: KWArgs = []
        for k, v in kwargs:
            f = names.get(k)
            if f is None:
                rest.append((k, v))
                continue
            setattr(self, k, _coerce(v, _resolve_type(f)))
        self.validate()
        return rest

    def validate(self) -> None:  # range checks, like DMLC_DECLARE_FIELD().set_range
        pass


def _resolve_type(f: dataclasses.Field) -> type:
    t = f.type
    if isinstance(t, type):
        return t
    # dataclass stores annotations as strings under `from __future__ import annotations`
    return {"int": int, "float": float, "str": str, "bool": bool}.get(str(t), str)


@dataclass
class DataParam(ParamBase):
    """Data pipeline knobs (reference: the data_* fields of SGDLearnerParam
    plus our static-shape padding policy, which replaces difacto's dynamic
    ``RowBlock`` minibatches)."""

    data_in: str = ""              # training data URI (file, dir, or glob)
    data_val: str = ""             # validation data URI
    data_format: str = "libsvm"    # libsvm | libffm (field:idx:val) |
                                   # csr (our pre-converted binary)
    batch_size: int = 8192         # examples per device step (global batch)
    shuffle: bool = True           # shuffle batches within a file part
    num_parts_per_file: int = 1    # split each file into N parts (InputSplit)
    max_nnz_per_row: int = 64      # pad/truncate each example to this nnz
    num_bits: int = 22             # hashed feature space = 2**num_bits rows
    host_localize: bool = True     # dedup ids in the prefetch thread
    prep_workers: int = 0          # threads for batch dedup/schedule prep;
                                   # 0 = auto (cpu_count - parse/batchify/
                                   # main threads, capped at 4 — measured:
                                   # oversubscribing a 4-core host HALVES
                                   # ingest, BENCH.md round 3)
    batch_workers: int = 2         # threads for shard hash+[B,L] padding
                                   # (1 = serial; replays depend on it)
    cache_batches: bool = False    # keep epoch-0 prepped batches in RAM and
                                   # reuse them (reference DataStore: epochs
                                   # >1 skip parse+localize; fixes batch
                                   # order across epochs like the reference)
    cache_on_device: bool = False  # with cache_batches: cache the PLACED
                                   # batches so later epochs read from HBM
                                   # (skips the host->device link; the
                                   # dataset's batches must fit on-chip)
    cache_compact: bool = False    # segsum=sorted only: cache the sort
                                   # PERMUTATION instead of the derived
                                   # sorted arrays (x_sorted/bidx/
                                   # inv_sorted) and regenerate them on
                                   # device per step (~2 extra resident
                                   # gathers). Cuts the cached-batch HBM
                                   # footprint ~2x — set it when a big
                                   # table + cache_on_device must share
                                   # one chip (2^26 + 6M rows fits)
    seed: int = 0

    def validate(self) -> None:
        assert self.batch_size > 0
        # <= 30: the padding sentinel is num_rows = 2**num_bits, which must
        # fit int32 with headroom (2**31 would wrap negative)
        assert 1 <= self.num_bits <= 30
        assert self.max_nnz_per_row > 0


@dataclass
class FMParam(ParamBase):
    """Model + optimizer knobs (reference: SGDUpdaterParam)."""

    # linear term w: FTRL-proximal (reference defaults)
    lr_eta: float = 0.01           # FTRL eta
    lr_beta: float = 1.0           # FTRL beta
    l1: float = 1.0                # L1 on w (drives exact sparsity)
    l2: float = 0.1                # L2 on w
    w_updater: str = "ftrl"        # ftrl | adagrad | sgd

    # latent factors V: AdaGrad, frequency-adaptive activation
    V_dim: int = 0                 # k; 0 = sparse logistic regression
    V_lr_eta: float = 0.01
    V_lr_beta: float = 1.0         # AdaGrad epsilon-ish damping
    V_l2: float = 0.0001
    V_init_scale: float = 0.01     # V ~ uniform(-scale, +scale)
    V_threshold: int = 2           # min feature count before V activates
    V_updater: str = "adagrad"     # adagrad | sgd

    tail_feature_filter: int = 0   # drop features with count < this (count pass)

    num_fields: int = 0            # loss=ffm: explicit field count F for
                                   # libffm `field:idx:val` data (fields
                                   # parsed per slot); 0 = slot position
                                   # is the field (F = max_nnz_per_row)
    ffm_block_size: int = 0        # loss=ffm: stream the O(B L^2 K) cross
                                   # terms in i-blocks of this many slots
                                   # (peak activations O(B*block*L*K)).
                                   # 0 = dense when it fits the activation
                                   # budget, else auto-picked at config
                                   # time (largest block that fits)

    def validate(self) -> None:
        assert self.V_dim >= 0
        assert self.num_fields >= 0
        assert self.ffm_block_size >= 0
        assert self.w_updater in ("ftrl", "adagrad", "sgd")
        assert self.V_updater in ("adagrad", "sgd")


@dataclass
class LearnerParam(ParamBase):
    """Trainer driver knobs (reference: SGDLearnerParam)."""

    learner: str = "sgd"           # sgd | bcd
    loss: str = "fm"               # fm | logit | ffm
    task: str = "train"            # train | predict (predict needs model_in)
    pred_out: str = ""             # write raw margins here when task=predict
    max_num_epochs: int = 1
    model_out: str = ""            # checkpoint path prefix
    model_in: str = ""             # warm-start checkpoint
    report_interval: int = 100     # steps between progress reports
    save_interval_epochs: int = 1
    save_interval_steps: int = 0   # also checkpoint every N steps (0 = off);
                                   # resume skips the consumed batches
    exact_auc_cap: int = 4 << 20   # max host-collected (label, score) pairs
                                   # for the exact validation AUC; past it a
                                   # uniform reservoir sample of this many
                                   # pairs replaces the collection and the
                                   # epoch row says so ("over N of M"). The
                                   # streaming binned `auc` (with its
                                   # computable error bound) always covers
                                   # the full pass. 0 disables exact AUC.
    bcd_num_blocks: int = 256      # feature blocks (reference: feagrp bits)
    bcd_tile_dir: str = ""         # disk tile cache location (reference
                                   # TileStore); "" = a fresh temp dir

    def validate(self) -> None:
        assert self.learner in ("sgd", "bcd")
        assert self.exact_auc_cap >= 0


@dataclass
class ShardParam(ParamBase):
    """Parallelism knobs (no reference counterpart: replaces the implicit
    DMLC_NUM_WORKERS/DMLC_NUM_SERVERS topology of ps-lite)."""

    store: str = "auto"            # local | sharded | auto (sharded if >1 device)
    num_shards: int = 0            # 0 = all visible devices
    capacity_factor: float = 2.0   # all_to_all slot slack vs perfect balance
    unique_size: int = 0           # 0 = batch_size*max_nnz (safe upper bound)
    kernel: str = "auto"           # xla | pallas (whole-table sweeps) |
                                   # pairs (touched-block sweeps) | auto
                                   # (= pairs on single-process TPU with
                                   # host_localize, else xla)
    layout: str = "auto"           # packed | planar | stacked | auto:
                                   # stacked = one [4+2K, N] table (ONE
                                   # gather + ONE scatter per step, only
                                   # an 8-sublane pad — fastest measured
                                   # XLA layout at every table size);
                                   # packed = one [N, 4+2K] row table
                                   # (historical; 128-lane row pad caps
                                   # it ~2^24); planar = split w/z/n/cnt
                                   # + [K, N] V (pallas table kernels).
                                   # auto = stacked for kernel=xla,
                                   # planar for kernel=pallas/pairs
    block_rows: int = 1024         # table rows per sweep-kernel block
    segsum: str = "auto"           # per-key gradient aggregation on the
                                   # host-prepped fm/logit paths (pairs
                                   # AND xla): sorted = sorted-slot
                                   # tile-matmul kernel (ops/segsum.py —
                                   # replaces the measured-10.9ms XLA
                                   # scatter-add); scatter = the XLA
                                   # scatter; auto = sorted on real TPU
                                   # (and pairs interpret tests), else
                                   # scatter
    interpret: bool = False        # run Pallas kernels in interpret mode
                                   # (CPU testing of kernel=pallas/pairs;
                                   # does NOT check Mosaic rules)
    hot_rows: int = 0              # big-table hot/cold frequency split
                                   # (kernel=xla LocalStore): relabel
                                   # rows by observed frequency and keep
                                   # the hottest hot_rows in a separate
                                   # small table whose per-index
                                   # scatter/gather cost is ~7x lower
                                   # (measured cliff ~2^18 rows at K=16,
                                   # scripts/hw_scatter_cliff.py).
                                   # 0 = off, -1 = auto-size to the
                                   # fast-scatter budget
    hot_count_batches: int = 16    # batches sampled for the frequency
                                   # remap's count pass (hot_rows != 0).
                                   # Measured: 8 flagship batches already
                                   # put 64.6% of a held-out batch's
                                   # uniques in the head (vs ~68% from a
                                   # big sample) — the sample is a cold
                                   # first read of the shards, so small
                                   # is fast (BENCH.md round 5b)
    # (round 3: the opt-in "sorted" slot pipeline was REMOVED — measured
    # 112.8 ms/step vs the prepped pair path's 23.1 at flagship shapes,
    # with no winning regime; see BENCH.md "Sorted pipeline" history)


@dataclass
class Config:
    data: DataParam = field(default_factory=DataParam)
    model: FMParam = field(default_factory=FMParam)
    learner: LearnerParam = field(default_factory=LearnerParam)
    shard: ShardParam = field(default_factory=ShardParam)

    @classmethod
    def from_kwargs(cls, kwargs: KWArgs) -> "Config":
        cfg = cls()
        rest = kwargs
        for sub in (cfg.data, cfg.model, cfg.learner, cfg.shard):
            rest = sub.init(rest)
        if rest:
            raise ValueError(f"unknown config keys: {[k for k, _ in rest]}")
        cfg.check()
        return cfg

    def check(self) -> None:
        """Cross-param consistency (reference: difacto.cc fails fast on
        inconsistent kwargs before the learner starts)."""
        if self.shard.hot_rows and self.learner.learner != "sgd":
            raise ValueError(
                "hot_rows (frequency-split table) is an SGD/LocalStore "
                "feature; BCD keeps its own block-tiled layout"
            )
        if self.shard.hot_rows and not self.data.host_localize:
            raise ValueError(
                "hot_rows needs host_localize=1 (the remap and the "
                "hot/cold bucket split are host-side prep work)"
            )
        if self.shard.segsum not in ("auto", "sorted", "scatter"):
            raise ValueError(
                f"segsum must be auto|sorted|scatter, got {self.shard.segsum!r}"
            )
        if self.model.num_fields > 0:
            if self.learner.loss != "ffm":
                raise ValueError("num_fields is only meaningful with loss=ffm")
            if self.data.data_format != "libffm":
                raise ValueError(
                    "num_fields > 0 needs data_format=libffm "
                    "(field:idx:val rows carry the field ids)"
                )
        if (
            self.learner.loss == "ffm"
            and self.data.data_format == "libffm"
            and self.model.num_fields == 0
        ):
            raise ValueError(
                "loss=ffm on libffm data needs num_fields=<field count> "
                "(with num_fields=0 the slot position is the field, which "
                "ignores the file's field ids)"
            )
        if self.learner.loss == "ffm" and self.model.V_dim > 0:
            # The dense ffm_loss_grad materializes ~6 [B, L, L, K]-sized
            # f32 activations (A, At, G, Gj + M/T/dV4 lower-order terms)
            # — the classic O(B L^2 K) FFM cost. Past the activation
            # budget the loss streams the i axis in ffm_block_size-slot
            # chunks (peak ~3 [B, block, L, K] buffers), the counterpart
            # of the reference's row-streamed CSR SpMM — auto-picked
            # here when unset so long-row configs train instead of
            # failing (VERDICT r3 weak #4 / r4 weak #4).
            B, L, K = (
                self.data.batch_size,
                self.data.max_nnz_per_row,
                self.model.V_dim,
            )
            est = 6 * B * L * L * K * 4
            cap = 8 << 30  # leave the 16 GB v5e HBM room for state + batch
            if est > cap and self.model.ffm_block_size == 0:
                blk = max(8, cap // (3 * B * L * K * 4) // 8 * 8)
                if 3 * B * blk * L * K * 4 > cap:
                    raise ValueError(
                        f"loss=ffm activations ~{est / (1 << 30):.1f} GiB "
                        f"(6 * batch_size {B} * max_nnz_per_row^2 {L}^2 * "
                        f"V_dim {K} * 4 B) exceed the {cap >> 30} GiB "
                        "budget even blocked — lower batch_size or "
                        "max_nnz_per_row (cost is O(B L^2 K))"
                    )
                self.model.ffm_block_size = int(min(blk, L))

    def expects_fields(self) -> bool:
        """True when batches must carry explicit per-slot field ids."""
        return self.learner.loss == "ffm" and self.model.num_fields > 0

    def effective_model_param(self) -> FMParam:
        """The FMParam the updater/table actually uses. For loss=ffm the
        per-feature factor payload is F*k (F = num_fields when set —
        libffm explicit fields — else max_nnz_per_row: slot position is
        the field), stored in the same planar table."""
        p = dataclasses.replace(self.model)
        if self.learner.loss == "ffm":
            F = self.model.num_fields or self.data.max_nnz_per_row
            p.V_dim = self.model.V_dim * F
        return p
