"""Shared run-scoped counters — the one piece of mutable observability
state the Dataset API can't express (stage UDFs run on workers; the counts
must accumulate across all of them).

≙ the reference's per-database Prometheus counters
(/root/reference/lib/oplog/tail.go:109-114: oplog entries filtered by the
denylist, labeled by database).  A tiny zero-CPU Ray actor accumulates
{label: count} increments fired-and-forgotten from stage UDFs (one call per
batch *that actually dropped rows*, so the hot path pays nothing when the
denylist is empty or misses); the driver snapshots it once per run into
``metrics.json``.

Counter semantics match Prometheus counters, not the exactly-once sink:
a retried task double-counts its increments (the reference's counters do
the same on reconnect/replay) — monitoring data, not lineage.
"""

from __future__ import annotations


def make_counter_actor():
    """Create the (lazily imported) counter actor. num_cpus=0: it must
    never compete with pipeline tasks for scheduling slots."""
    import ray

    @ray.remote(num_cpus=0)
    class _Counter:
        def __init__(self):
            self.counts: dict[str, int] = {}

        def add(self, increments: dict) -> None:
            for k, v in increments.items():
                self.counts[k] = self.counts.get(k, 0) + int(v)

        def snapshot(self) -> dict:
            return dict(self.counts)

    return _Counter.remote()


def snapshot_counter(handle, timeout_s: float = 10.0) -> dict:
    """Drain the actor's state; swallows failure (metrics must not fail a
    run that already committed its data)."""
    import ray

    if handle is None:
        return {}
    try:
        return ray.get(handle.snapshot.remote(), timeout=timeout_s)
    except Exception:
        return {}
