"""Shared streaming hash-exchange helpers.

``per_key_blocks`` is the engine's fast replacement for
``groupby(keys).map_groups(fn)``: one hash repartition co-locates and sorts
the keys, then a single block-level ``map_batches`` processes ALL groups in a
block with vectorized (pandas/Arrow) ops — no per-group function-call
overhead, no sort-based shuffle.

Group-completeness invariant: a key group must never straddle two blocks.
Ray 2.49's hash-shuffle finalize emits exactly ONE block per partition
(hash_shuffle.py ``finalize`` yields a single block; splitting to
target_max_block_size is an unimplemented TODO), the same guarantee Ray's own
``GroupedData.map_groups`` relies on. tests/test_dedup.py pins it with an
oversized-partition fixture.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

import ray.data as rd


class _EmptySchemaWarningFilter(logging.Filter):
    """Drop the executor's schema-divergence warning ONLY for the benign
    empty-new-schema case: a hash exchange with more partitions than occupied
    keys finalizes its empty partitions as zero-block bundles that bypass the
    downstream map UDF, so the operator's output stream interleaves typed
    bundles with schemaless ones. Real schema divergences (both sides typed)
    still warn."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("different schema" in msg and "new schema: ." in msg)


def silence_empty_partition_warning() -> None:
    """Idempempotently install the empty-schema filter on the streaming
    executor's logger (driver-side; the warning is emitted there)."""
    lg = logging.getLogger("ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaWarningFilter) for f in lg.filters):
        lg.addFilter(_EmptySchemaWarningFilter())


def tune_exchange(ds: rd.Dataset, num_partitions: int) -> None:
    """Switch the dataset's context to the hash-shuffle strategy and budget
    the aggregator actors so concurrent exchanges (repartition, groupby,
    join) can't starve the map stages of CPUs — the untuned join default is
    0.125 CPU/partition, which deadlocks small clusters when several
    exchanges coexist in one plan."""
    import ray
    from ray.data.context import ShuffleStrategy

    silence_empty_partition_warning()
    ctx = ds.context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    ctx.max_hash_shuffle_aggregators = max(2, total // 4)
    per_part = max(0.5, total / 16) / num_partitions
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = per_part
    ctx.join_operator_actor_num_cpus_per_partition_override = per_part


def per_key_blocks(ds: rd.Dataset, keys: list[str], block_fn: Callable,
                   num_partitions: int = 16,
                   batch_format: str = "pyarrow") -> rd.Dataset:
    """Hash-partition + sort on ``keys``, then map ``block_fn`` over whole
    blocks. Each block holds every row of each of its keys, sorted by keys;
    ``block_fn`` must handle many groups per call (vectorized) and the empty
    block."""
    tune_exchange(ds, num_partitions)
    return ds.repartition(num_partitions, keys=keys, sort=True).map_batches(
        block_fn, batch_format=batch_format, batch_size=None,
        zero_copy_batch=True,
    )
