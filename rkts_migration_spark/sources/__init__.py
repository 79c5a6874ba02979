"""Table IO: Iceberg when its runtime is on the classpath (production
target — atomic snapshot commits, incremental reads), transparent
parquet-directory fallback with JSON manifests locally (this sandbox
has no Iceberg jar). Both paths give the pipeline the same property:
a stage is either fully committed or absent, so resume is safe."""

from .tables import read_stage, write_stage, stage_is_complete, stage_manifest  # noqa: F401
