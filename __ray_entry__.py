"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``   — flagship windowed exactly-once CDC replay of the synthetic
  transcript log derived from sf0.001, returning the final lake Dataset.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (plus the training-data ops); each takes ``sf_dir``.
- ``oracle_sql()`` — equivalent DuckDB SQL for every query.  The sketch
  pipelines (minhash/simhash/ivf) export their deterministic intermediates
  (signatures, IVF index) as parquet; their oracle SQL replays the full
  downstream derivation (candidate pairs, Jaccard verification, connected
  components, probe-set search) from those identical values.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from oplogtoredis_ray.pipelines.queries import q_cdc_apply

    return q_cdc_apply("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from oplogtoredis_ray.pipelines.queries import QUERIES, ensure_synth_log

    # the synthetic transcript log for the driver's sf0.01 comparison must
    # exist before the oracle SQL (which reads the same files) can run
    ensure_synth_log("/root/testdata/sf0.01")
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oplogtoredis_ray.pipelines.queries import (
        ensure_oracle_intermediates,
        ensure_synth_log,
        oracle_sql_map,
    )

    ensure_synth_log("/root/testdata/sf0.01")
    # the sketch oracles read parquet intermediates exported by their Ray
    # queries; produce them up front in case oracles are evaluated first
    # (no-op if Ray isn't initialised — the driver inits Ray before calling)
    ensure_oracle_intermediates("/root/testdata/sf0.01")
    return oracle_sql_map("sf0.01")
