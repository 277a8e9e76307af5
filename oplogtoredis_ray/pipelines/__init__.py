from oplogtoredis_ray.pipelines.ingest import run_ingest, run_window  # noqa: F401
