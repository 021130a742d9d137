"""Composed, runnable jobs.

The reference's three entry points (SURVEY.md §3) map to
`speed_layer` (streaming fan-out), `batch_job` (incremental cron
batch) and `train` (model trainer → versioned bundle). The
LLM-pipeline extensions add `curate` (the corpus-curation funnel),
`export_training` (sharded text export + the tensor-ready packed
variant), `dim_build` (SCD2 dimension maintenance, batch + streaming)
`dedup_index` (on-disk MinHash index lifecycle: build / verdict /
append / compact; its streaming consumer is
`streaming/dedup_stream.py`) and `ann_index` (on-disk IVF inverted
file: build / append under frozen centroids / query / compact). Every
job is `python -m`-runnable with a CLI.
"""
