"""LSM index of immutable parts (reference: index/lsm.go, parts/part.go).

Parts are immutable column batches tagged with the transaction that created
them. L0 holds raw inserted batches (the reference's Arrow-record parts,
parts/arrow.go); higher levels hold compacted, sorted batches (the
reference's Parquet parts, parts/parquet.go). The reference's lock-free
linked list with CAS splicing (index/lsm.go:37,628) maps to a mutex-guarded
Python list here — the insert hot path on this engine is the device upload,
not list manipulation.

Scan order is newest-first within L0 then deeper levels, matching the
reference's head-first list iteration (index/lsm.go:401 Scan).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

from .columnbatch import ColumnBatch, KIND_DICT
from .device import DeviceBatch


class Part:
    """Immutable part (reference: parts/part.go:12 Part interface)."""

    def __init__(self, batch: ColumnBatch, tx: int, compaction_level: int = 0):
        self.batch = batch
        self.tx = tx
        self.compaction_level = compaction_level
        self._device: Optional[DeviceBatch] = None
        self._zone_map: Optional[dict] = None
        self._raw_ranges: dict = {}

    def num_rows(self) -> int:
        return self.batch.num_rows

    def size_bytes(self) -> int:
        total = 0
        for c in self.batch.columns:
            total += c.values.nbytes + c.validity.nbytes
        return total

    def device(self) -> DeviceBatch:
        """Cached device mirror — parts are immutable so the upload happens
        once and stays HBM-resident across queries."""
        if self._device is None:
            self._device = DeviceBatch(self.batch)
        return self._device

    def raw_range(self, name: str):
        """(min, max) over a column's raw values buffer *including* null
        slots — null slots participate in sums like the reference's
        raw-buffer sum (aggregate.go:763), so value-range bounds for the
        compiled digit decomposition must cover them. Cached: parts are
        immutable. Returns None if the column is absent or empty."""
        if name in self._raw_ranges:
            return self._raw_ranges[name]
        c = self.batch.column(name)
        r = None
        if c is not None and len(c.values):
            r = (int(c.values.min()), int(c.values.max()))
        self._raw_ranges[name] = r
        return r

    def zone_map(self) -> dict:
        """Per-column min/max for scan pruning (the reference prunes row
        groups with parquet column indexes via TrueNegativeFilter,
        query/expr/filter.go:38; here zone maps are computed once per part).
        """
        if self._zone_map is None:
            zm: dict[str, tuple] = {}
            for c in self.batch.columns:
                if c.kind == KIND_DICT or not c.validity.any():
                    continue
                vals = c.values[c.validity]
                if len(vals) == 0:
                    continue
                zm[c.name] = (vals.min(), vals.max())
            self._zone_map = zm
        return self._zone_map


@dataclass
class LevelConfig:
    """reference: index/lsm.go:71 LevelConfig."""

    level: int
    max_size: int
    compact: Optional[Callable[[list[Part]], list[Part]]] = None


class LSM:
    """reference: index/lsm.go:122."""

    def __init__(self, levels: Sequence[LevelConfig], on_compact=None):
        self.configs = list(levels)
        # parts per level, newest first.
        self.levels: list[list[Part]] = [[] for _ in range(len(self.configs))]
        self._lock = threading.Lock()
        self.on_compact = on_compact
        self.watermark: Callable[[], int] = lambda: 2**63
        self.compacting = threading.Lock()

    def add(self, tx: int, batch: ColumnBatch) -> Part:
        """Prepend an L0 part (reference: index/lsm.go:332 Add)."""
        part = Part(batch, tx, 0)
        with self._lock:
            self.levels[0].insert(0, part)
        self.maybe_compact()
        return part

    def insert_part(self, part: Part) -> None:
        """Insert an already-built part at its compaction level (reference:
        index/lsm.go:357 InsertPart, used by snapshot recovery)."""
        lvl = min(part.compaction_level, len(self.levels) - 1)
        with self._lock:
            self.levels[lvl].insert(0, part)

    def scan(self, tx: int) -> list[Part]:
        """Parts visible at tx, newest-first (reference: index/lsm.go:401)."""
        with self._lock:
            out = []
            for level in self.levels:
                for p in level:
                    if p.tx <= tx:
                        out.append(p)
            return out

    def level_size(self, level: int) -> int:
        with self._lock:
            return sum(p.size_bytes() for p in self.levels[level])

    def maybe_compact(self) -> None:
        """Cascade compaction when a level exceeds its max size (reference:
        index/lsm.go:653 compact)."""
        for cfg in self.configs[:-1]:
            if self.level_size(cfg.level) < cfg.max_size:
                continue
            self.compact_level(cfg.level)

    def compact_level(self, level: int) -> None:
        cfg = self.configs[level]
        if cfg.compact is None:
            return
        if not self.compacting.acquire(blocking=False):
            return
        try:
            # Watermark-bounded cut: only compact parts whose tx is visible
            # (reference: index/lsm.go:532 merge bounds by watermark).
            wm = self.watermark()
            with self._lock:
                eligible = [p for p in self.levels[level] if p.tx <= wm]
                if not eligible:
                    return
                keep = [p for p in self.levels[level] if p.tx > wm]
            compacted = cfg.compact(eligible)
            with self._lock:
                self.levels[level] = keep
                for p in reversed(compacted):
                    p.compaction_level = level + 1
                    self.levels[level + 1].insert(0, p)
            if self.on_compact is not None:
                self.on_compact(level)
        finally:
            self.compacting.release()

    def rotate(self, compact_fn) -> list[Part]:
        """Drain every part into a final compacted set for block persistence
        (reference: index/lsm.go:507 Rotate)."""
        with self._lock:
            all_parts = [p for level in self.levels for p in level]
            self.levels = [[] for _ in range(len(self.configs))]
        if not all_parts:
            return []
        return compact_fn(all_parts)

    def snapshot(self) -> list[Part]:
        """Stable view of all parts (reference: index/lsm.go:255)."""
        with self._lock:
            return [p for level in self.levels for p in level]

    def num_parts(self) -> int:
        with self._lock:
            return sum(len(l) for l in self.levels)


def prune_part(part: Part, filter_expr) -> bool:
    """True if the part can definitely not contain matching rows — the
    TrueNegativeFilter contract (reference: query/expr/filter.go:38: false
    negatives are forbidden, false positives are fine)."""
    from .query import expr as E

    if filter_expr is None:
        return False

    zm = part.zone_map()

    def cannot_match(e) -> bool:
        if isinstance(e, E.BinaryExpr):
            if e.op == E.OP_AND:
                return cannot_match(e.left) or cannot_match(e.right)
            if e.op == E.OP_OR:
                return cannot_match(e.left) and cannot_match(e.right)
            if isinstance(e.left, (E.Column,)) and isinstance(e.right, E.Literal):
                name = e.left.column_name
                lit = e.right.value
                if name not in zm or lit is None or isinstance(lit, str):
                    return False
                lo, hi = zm[name]
                try:
                    if e.op == E.OP_EQ:
                        return lit < lo or lit > hi
                    if e.op == E.OP_GT:
                        return hi <= lit
                    if e.op == E.OP_GT_EQ:
                        return hi < lit
                    if e.op == E.OP_LT:
                        return lo >= lit
                    if e.op == E.OP_LT_EQ:
                        return lo > lit
                except TypeError:
                    return False
        return False

    return cannot_match(filter_expr)
