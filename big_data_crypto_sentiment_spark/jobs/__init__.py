"""Composed, runnable jobs mirroring the reference's three entry points
(SURVEY.md §3): the streaming speed layer, the cron batch job, and the
model trainer."""
