"""Minimal DAG runner replacing the reference's Celery orchestration (§2.11).

Reference: Celery chains ``a.s() | b.s()`` and groups ``group([...])``
(/root/reference tasks/__init__.py:102-156, tasks/wind/__init__.py:33-66),
beat cron for scheduling. Here a Job is a named callable taking the
SparkSession; a Pipeline executes in topological waves — each wave's jobs are
independent and run concurrently on their own Spark scheduler pools (Spark's
scheduler is the parallelism layer; no process pools). A failed job skips its
downstream subtree, matching Celery chain semantics.
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class Job:
    name: str
    fn: Callable[[SparkSession], object]
    depends_on: list[str] = field(default_factory=list)


@dataclass
class JobResult:
    name: str
    ok: bool
    seconds: float
    error: str | None = None


class Pipeline:
    """chain = dependency edge; group = jobs sharing a wave."""

    def __init__(self, jobs: list[Job], max_parallel: int = 4):
        self.jobs = {j.name: j for j in jobs}
        if len(self.jobs) != len(jobs):
            raise ValueError("duplicate job names")
        for j in jobs:
            for dep in j.depends_on:
                if dep not in self.jobs:
                    raise ValueError(f"{j.name} depends on unknown job {dep!r}")
        self.max_parallel = max_parallel

    def run(self, spark: SparkSession) -> dict[str, JobResult]:
        results: dict[str, JobResult] = {}
        done: set[str] = set()
        failed: set[str] = set()

        def run_job(job: Job) -> JobResult:
            t0 = time.time()
            try:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", job.name)
                job.fn(spark)
                return JobResult(job.name, True, time.time() - t0)
            except Exception:
                return JobResult(job.name, False, time.time() - t0,
                                 traceback.format_exc())

        pending = set(self.jobs)
        with ThreadPoolExecutor(max_workers=self.max_parallel) as pool:
            while pending:
                wave = [self.jobs[n] for n in pending
                        if all(d in done for d in self.jobs[n].depends_on)]
                if not wave:
                    # distinguish TRANSITIVE downstream-of-failure from a
                    # genuine dependency cycle — "some other job failed"
                    # must not mask a cycle that would never run anyway
                    def blocked_by_failure(name: str,
                                           seen: frozenset = frozenset()
                                           ) -> bool:
                        for d in self.jobs[name].depends_on:
                            if d in failed:
                                return True
                            if (d in pending and d not in seen
                                    and blocked_by_failure(
                                        d, seen | {name})):
                                return True
                        return False

                    for n in sorted(pending):
                        reason = ("skipped: upstream failed"
                                  if blocked_by_failure(n)
                                  else "dependency cycle")
                        results[n] = JobResult(n, False, 0.0, reason)
                    break
                for res in pool.map(run_job, wave):
                    results[res.name] = res
                    (done if res.ok else failed).add(res.name)
                    pending.discard(res.name)
        return results
