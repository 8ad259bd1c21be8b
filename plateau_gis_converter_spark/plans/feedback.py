"""Pipeline progress + cooperative cancellation.

Reference parity: the reference runs its pipeline over an in-process
Feedback channel carrying progress messages plus a ``Canceller`` whose
flag every stage polls (nusamai/src/pipeline/feedback.rs:26-141). A long
100 TB Spark job needs the same two things — live progress metrics and a
kill switch that stops work *now* but leaves the lineage log consistent
so the run resumes cleanly (plans/lineage.py).

Spark mapping:

* **Progress** — a daemon thread polls
  ``SparkContext.statusTracker()`` (the public Python surface over the
  JVM's SparkListener bus; attaching a raw SparkListener from Python
  needs the py4j callback server, which headless deployments disable)
  and emits per-stage ``{job, stage, active, done, tasks}`` events to an
  in-memory ring + an optional callback. O(active stages) per tick, no
  driver memory growth.
* **Cancel** — every Spark action the pipeline issues runs under a job
  group (``setJobGroup(..., interruptOnCancel=True)``).
  ``Canceller.cancel()`` calls ``cancelJobGroup``: in-flight stages are
  killed JVM-side (the non-cooperative half), and the pipeline's own
  stage loop polls ``check()`` between stages (the cooperative half,
  mirroring the reference's flag). Because lineage commits happen only
  AFTER a stage's action returns, a cancelled action commits nothing —
  at-least-once resume semantics are preserved exactly.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession


class PipelineCancelled(RuntimeError):
    """Raised by the pipeline when its Canceller fired. The lineage log
    is consistent at raise time: every committed key is durable, every
    in-flight key will be reprocessed on resume."""


class PipelineFeedback:
    """Progress reporter + canceller for one pipeline run.

    Usage::

        fb = PipelineFeedback(spark, run_id="r1")
        try:
            run_web_pipeline(spark, pages, out, run_id="r1", feedback=fb)
        except PipelineCancelled:
            ...   # resume later with the same run_id
        finally:
            fb.close()
    """

    def __init__(self, spark: SparkSession, run_id: str,
                 poll_s: float = 0.25, on_progress=None,
                 max_events: int = 10_000):
        self.spark = spark
        self.run_id = run_id
        self.group = f"pipeline-{run_id}"
        self._cancelled = threading.Event()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._poll_s = poll_s
        self._on_progress = on_progress
        self._max_events = max_events
        self.events: list[dict] = []

    # -- progress ----------------------------------------------------------
    def attach(self) -> None:
        """Call on the thread that issues the Spark actions: tags all its
        jobs with this run's job group and starts the progress poller."""
        self.spark.sparkContext.setJobGroup(
            self.group, f"web pipeline {self.run_id}",
            interruptOnCancel=True)
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._poll, name=f"feedback-{self.run_id}",
                daemon=True)
            self._thread.start()

    def _poll(self) -> None:
        st = self.spark.sparkContext.statusTracker()
        while not self._stop.is_set():
            try:
                for jid in st.getActiveJobsIds():
                    ji = st.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si is None or si.numTasks == 0:
                            continue
                        ev = {"job": int(jid), "stage": int(sid),
                              "active": int(si.numActiveTasks),
                              "done": int(si.numCompletedTasks),
                              "tasks": int(si.numTasks)}
                        if len(self.events) < self._max_events:
                            self.events.append(ev)
                        if self._on_progress is not None:
                            self._on_progress(ev)
            except Exception:  # tracker races with job teardown; keep polling
                pass
            self._stop.wait(self._poll_s)

    # -- cancellation ------------------------------------------------------
    def cancel(self) -> None:
        """Kill switch: cancels every in-flight Spark job in this run's
        group and arms the cooperative flag. Safe from any thread."""
        self._cancelled.set()
        self.spark.sparkContext.cancelJobGroup(self.group)

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def check(self) -> None:
        """Cooperative poll point (the reference's Canceller flag)."""
        if self.cancelled:
            raise PipelineCancelled(
                f"pipeline run {self.run_id} cancelled")

    # -- teardown ----------------------------------------------------------
    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # un-tag the calling thread so later jobs aren't cancellable here
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
