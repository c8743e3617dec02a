"""Latency simulation record (reference `DyNetSimulator/report.py:5-44`)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SimulationReport:
    """Accumulating latency record.

    ``latency`` is the total predicted seconds; compute/memory components are
    tracked separately so roofline balance is inspectable. ``cfg`` holds the
    winning tile configuration per op (kept as a list when reports add).
    """

    latency: float = 0.0
    compute_latency: float = 0.0
    memory_latency: float = 0.0
    cfg: list = field(default_factory=list)

    def __add__(self, other: "SimulationReport") -> "SimulationReport":
        return SimulationReport(
            latency=self.latency + other.latency,
            compute_latency=self.compute_latency + other.compute_latency,
            memory_latency=self.memory_latency + other.memory_latency,
            cfg=self.cfg + other.cfg,
        )

    def __radd__(self, other):
        # Allow sum() starting from 0.
        if other == 0:
            return self
        return self.__add__(other)

    def scaled(self, factor: float) -> "SimulationReport":
        return SimulationReport(
            latency=self.latency * factor,
            compute_latency=self.compute_latency * factor,
            memory_latency=self.memory_latency * factor,
            cfg=list(self.cfg),
        )
