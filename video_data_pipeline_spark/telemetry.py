"""Driver-side stage-metrics telemetry: spill / shuffle bytes per query.

Motivation (r10/r11 VERDICT #5): the sfp30 probe's uncapped pair joins
died as *disk exhaustion five minutes in* — the only observable was the OS
filling up. The metric that names the pathology before the disk fills is
``diskBytesSpilled`` (and its memory twin), which Spark already tracks per
stage; this module surfaces it driver-side so ``tools/scale_probe.py`` and
``tools/bench_e2e.py`` can record a per-query spill/shuffle budget and
WARN while the job is still healthy.

Why not a ``SparkListener``: a Python listener needs the py4j callback
server (an extra socket + thread, and a hard dependency on gateway
lifecycle). The driver's ``AppStatusStore`` — the store the Spark UI reads
— already aggregates task metrics per stage, so we read it directly
through the existing py4j gateway: zero setup, works on any driver
session, and survives query failures (the partial stages are still in the
store, so a killed probe cell still reports how much it had spilled).

Caveats, by construction:
- totals are CUMULATIVE across the session; use :class:`StageMetricsDelta`
  around a unit of work for per-query numbers.
- the store retains ``spark.ui.retainedStages`` (default 1000) stages;
  past that, evicted stages leave the cumulative total, so very long
  sessions can see a delta UNDERCOUNT (never an overcount of live work).
  Deltas clamp at zero.
"""

from __future__ import annotations

#: AppStatusStore getter -> snake_case key in our records
_METRICS = {
    "diskBytesSpilled": "disk_spill_bytes",
    "memoryBytesSpilled": "memory_spill_bytes",
    "shuffleWriteBytes": "shuffle_write_bytes",
    "shuffleReadBytes": "shuffle_read_bytes",
}

#: default WARN threshold: 8 GiB of disk spill in one query is the scale of
#: the sfp30 pathology's opening minutes, far above every healthy query's
#: measured spill (0 across the r12 probe matrix at sf0.01-sf10)
SPILL_WARN_BYTES = 8 << 30


def cumulative_stage_metrics(spark) -> dict[str, int]:
    """Sum spill/shuffle byte counters over every stage the driver's
    status store currently retains (completed, failed, and running —
    failed stages matter: the spill that killed a cell is the datum)."""
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    # full Scala signature (no py4j default-arg support):
    # stageList(statuses, details, withSummaries, unsortedQuantiles, taskStatus)
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    out = dict.fromkeys(_METRICS.values(), 0)
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        for getter, key in _METRICS.items():
            out[key] += int(getattr(s, getter)())
    return out


class StageMetricsDelta:
    """Context manager: per-unit-of-work spill/shuffle bytes.

    >>> with StageMetricsDelta(spark) as m:
    ...     df.write.format("noop").mode("overwrite").save()
    >>> m.delta  # {'disk_spill_bytes': 0, 'shuffle_write_bytes': 1234, ...}
    >>> m.warning  # None, or a human-readable spill warning string

    ``delta``/``warning`` are also populated when the body RAISES — the
    spill of a dying query is exactly the number the probe wants."""

    def __init__(self, spark, warn_bytes: int = SPILL_WARN_BYTES):
        self._spark = spark
        self._warn_bytes = warn_bytes
        self.delta: dict[str, int] = {}
        self.warning: str | None = None

    def __enter__(self) -> "StageMetricsDelta":
        self._before = cumulative_stage_metrics(self._spark)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            after = cumulative_stage_metrics(self._spark)
        except Exception:  # noqa: BLE001 — a dead session shouldn't mask exc
            return
        self.delta = {
            k: max(0, after[k] - self._before.get(k, 0)) for k in after
        }
        spilled = self.delta["disk_spill_bytes"] + self.delta["memory_spill_bytes"]
        if spilled > self._warn_bytes:
            self.warning = (
                f"SPILL WARNING: {self.delta['disk_spill_bytes'] >> 20} MiB disk "
                f"+ {self.delta['memory_spill_bytes'] >> 20} MiB memory spilled "
                f"(> {self._warn_bytes >> 30} GiB threshold) — pathological "
                "corpus shape (hot bucket / skewed key); check the operator's "
                "cap telemetry before the spill disk fills"
            )
