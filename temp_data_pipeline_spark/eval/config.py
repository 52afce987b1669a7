"""Evaluation configuration dataclasses (reference eval/config.py:74-161).

Validated at construction; JSON round-trip for run artifacts. The
reference additionally shells out to git for run metadata
(`eval/config.py:210-223`); here metadata capture lives in report.py
and timestamps are injected for reproducible artifacts (SURVEY §7.4).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from datetime import date
from pathlib import Path
from typing import Any


@dataclass
class SplitConfig:
    type: str = "static"  # "static" | "walk_forward"
    train_frac: float = 0.70
    val_frac: float = 0.15
    test_frac: float = 0.15
    window_size: int | None = None
    step_size: int | None = None
    expanding: bool = False

    def __post_init__(self) -> None:
        if self.type not in ("static", "walk_forward"):
            raise ValueError(f"Unknown split type: {self.type}")
        if self.type == "static":
            total = self.train_frac + self.val_frac + self.test_frac
            if abs(total - 1.0) > 1e-6:
                raise ValueError(f"Fractions must sum to 1, got {total}")
        if self.type == "walk_forward" and (
            self.window_size is None or self.step_size is None
        ):
            raise ValueError("walk_forward requires window_size and step_size")


@dataclass
class ModelConfig:
    type: str = "passthrough"  # passthrough | persistence | ridge | knn | xgboost
    name: str | None = None
    alpha: float = 1.0  # ridge
    features: list[str] | None = None
    n_neighbors: int = 50  # knn
    hyperparams: dict[str, Any] = field(default_factory=dict)

    def display_name(self) -> str:
        if self.name:
            return self.name
        return {
            "passthrough": "Passthrough",
            "persistence": "Persistence",
            "ridge": "Ridge",
            "knn": f"kNN (k={self.n_neighbors})",
            "xgboost": "XGBoost",
        }.get(self.type, self.type)


@dataclass
class EvalConfig:
    station_ids: list[str] = field(default_factory=lambda: ["KLGA"])
    start_date_local: str = "2020-01-01"
    end_date_local: str = "2024-12-31"
    min_coverage_hours: int = 18
    lead_hours_allowed: list[int] | None = None
    split: SplitConfig = field(default_factory=SplitConfig)
    models: list[ModelConfig] = field(default_factory=lambda: [ModelConfig()])
    sigma_type: str = "bucketed"  # global | bucketed | rolling
    sigma_buckets: list[tuple[int, int]] | None = None
    sigma_floor: float = 1.0
    seed: int = 42

    def __post_init__(self) -> None:
        if not self.station_ids:
            raise ValueError("station_ids must be non-empty")
        date.fromisoformat(self.start_date_local)
        date.fromisoformat(self.end_date_local)
        if self.start_date_local > self.end_date_local:
            raise ValueError("start_date_local after end_date_local")
        if self.min_coverage_hours < 0 or self.min_coverage_hours > 24:
            raise ValueError("min_coverage_hours must be in [0, 24]")
        if self.sigma_type not in ("global", "bucketed", "rolling"):
            raise ValueError(f"Unknown sigma type: {self.sigma_type}")

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2, default=str))

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> EvalConfig:
        d = dict(d)
        if isinstance(d.get("split"), dict):
            d["split"] = SplitConfig(**d["split"])
        if d.get("models"):
            d["models"] = [
                ModelConfig(**m) if isinstance(m, dict) else m for m in d["models"]
            ]
        if d.get("sigma_buckets"):
            d["sigma_buckets"] = [tuple(b) for b in d["sigma_buckets"]]
        return cls(**d)

    @classmethod
    def from_json(cls, path: str | Path) -> EvalConfig:
        return cls.from_dict(json.loads(Path(path).read_text()))
