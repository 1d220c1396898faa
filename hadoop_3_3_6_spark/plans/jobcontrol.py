"""Multi-job orchestration (SURVEY.md §2.11).

Reference: JobControl/ControlledJob — a DAG of jobs run when their
dependencies complete (MRC/mapreduce/lib/jobcontrol/JobControl.java:57,
ControlledJob.java:51 under /root/reference/).

In Spark, chained single-query "jobs" collapse into one Catalyst plan
(the Grep two-job pipeline is one DataFrame expression here), so
JobControl is only needed across *materializing* steps — e.g. write
table A, then run two queries reading A.  This runner keeps that
cross-action orchestration: topological execution with failure
propagation (SKIPPED state for dependents, matching ControlledJob's
DEPENDENT_FAILED)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class JobState(str, Enum):
    WAITING = "WAITING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class ControlledJob:
    name: str
    run: Callable[[dict], object]  # receives {dep_name: dep_result}
    deps: list[str] = field(default_factory=list)
    state: JobState = JobState.WAITING
    result: object = None
    error: Exception | None = None


class JobControl:
    """Run a DAG of ControlledJobs in dependency order (serially — the
    parallelism that matters lives inside each Spark job)."""

    def __init__(self) -> None:
        self.jobs: dict[str, ControlledJob] = {}

    def add_job(self, job: ControlledJob) -> None:
        if job.name in self.jobs:
            raise ValueError(f"duplicate job {job.name!r}")
        self.jobs[job.name] = job

    def run(self) -> dict[str, ControlledJob]:
        order = self._topo_order()
        for name in order:
            job = self.jobs[name]
            failed_deps = [d for d in job.deps if self.jobs[d].state != JobState.SUCCESS]
            if failed_deps:
                job.state = JobState.DEPENDENT_FAILED
                continue
            try:
                job.result = job.run({d: self.jobs[d].result for d in job.deps})
                job.state = JobState.SUCCESS
            except Exception as e:  # noqa: BLE001 — job isolation is the point
                job.state = JobState.FAILED
                job.error = e
        return self.jobs

    def _topo_order(self) -> list[str]:
        seen: dict[str, int] = {}  # 0=visiting, 1=done
        out: list[str] = []

        def visit(name: str) -> None:
            if name not in self.jobs:
                raise ValueError(f"unknown dependency {name!r}")
            mark = seen.get(name)
            if mark == 1:
                return
            if mark == 0:
                raise ValueError(f"dependency cycle through {name!r}")
            seen[name] = 0
            for d in self.jobs[name].deps:
                visit(d)
            seen[name] = 1
            out.append(name)

        for name in self.jobs:
            visit(name)
        return out
