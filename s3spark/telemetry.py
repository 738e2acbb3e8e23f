"""Bench-observable side channels for keys whose single wall-clock
number hides internal structure.

``RUN_SPLITS``: key -> [seconds, ...] recorded by multi-run streaming
keys (each entry is one real streaming execution inside the key's
single registry invocation).  ``stream_outer_join_watermark`` runs two
cold-checkpoint availableNow executions against one checkpoint; its
10-20 s bench band was previously unattributable — a regression in run
1 (corpus processing) and in run 2 (sentinel + state flush) look
identical from outside.  bench.py copies this dict into
BENCH_DETAIL.json ("run_split") after timing, so round-over-round
spread is attributable per run (round-8 verdict item 8).

Keys overwrite their entry on every invocation; readers must consume
after the invocation they care about.  Not thread-safe by design —
bench runs keys serially.
"""

from __future__ import annotations

RUN_SPLITS: dict = {}
