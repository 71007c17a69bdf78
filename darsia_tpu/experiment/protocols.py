"""CSV-backed experiment protocols: imaging, injection, pressure/temperature.

Parity: reference ``src/darsia/experiment/protocols.py:20-750``.

CSV schemas (columns):
* imaging: ``image_id, datetime[, path]``; blacklist: ``image_id``.
* injection: ``location_x, location_y, start, end, rate_kg_s``.
* pressure/temperature: ``datetime, pressure, temperature``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Optional, Union

import numpy as np
import pandas as pd

__all__ = [
    "ImagingInterval",
    "ImagingProtocol",
    "InjectionProtocol",
    "ThermodynamicState",
    "PressureTemperatureProtocol",
]


def _load_table(path) -> pd.DataFrame:
    if isinstance(path, (list, tuple)):
        protocol_path, sheet = Path(path[0]), path[1]
    else:
        protocol_path, sheet = Path(path), None
    if protocol_path.suffix == ".csv":
        assert sheet is None, "Sheet name only applies to Excel files."
        return pd.read_csv(protocol_path)
    if protocol_path.suffix in (".xls", ".xlsx"):
        return pd.read_excel(protocol_path, sheet_name=sheet)
    raise ValueError(f"Unsupported protocol format {protocol_path.suffix}.")


def _normalize_injection_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize injection-rate columns onto ``rate_kg_s``.

    Accepts the reference template variants: ``rate_kg/s`` (rename),
    ``rate_sccm`` / ``rate_ml/min`` (converted with CO2 density at
    standard conditions, 1.98 kg/m^3 — reference protocols.py:527-556).
    """
    if "rate_kg_s" in df.columns:
        return df
    if "rate_kg/s" in df.columns:
        return df.rename(columns={"rate_kg/s": "rate_kg_s"})
    density_co2 = 1.98  # kg/m^3 at standard conditions
    if "rate_sccm" in df.columns:
        df["rate_kg_s"] = (
            df["rate_sccm"].astype(float) * density_co2 * 1e-6 / 60.0
        )
        return df
    if "rate_ml/min" in df.columns:
        df["rate_kg_s"] = (
            df["rate_ml/min"].astype(float) * density_co2 * 1e-6 / 60.0
        )
        return df
    raise ValueError(
        "Injection protocol needs one of: rate_kg_s, rate_kg/s, rate_sccm, "
        "rate_ml/min."
    )


def _parse_datetime(value) -> datetime:
    if isinstance(value, datetime):
        return value
    return pd.to_datetime(value).to_pydatetime()


@dataclass
class ImagingInterval:
    """Regular imaging interval: ids [start_id, end_id] at fixed dt."""

    start_id: int
    end_id: int
    start_datetime: datetime
    dt_seconds: float

    def contains(self, image_id: int) -> bool:
        return self.start_id <= image_id <= self.end_id

    def get_datetime(self, image_id: int) -> datetime:
        assert self.contains(image_id)
        from datetime import timedelta

        return self.start_datetime + timedelta(
            seconds=(image_id - self.start_id) * self.dt_seconds
        )


class ImagingProtocol:
    """Image id/path -> acquisition datetime, with blacklisting."""

    def __init__(self, path, pad: int, blacklist=None) -> None:
        self.df = _load_table(path)
        self.pad = pad
        if blacklist is not None:
            blacklist_df = _load_table(blacklist)
        else:
            blacklist_df = pd.DataFrame(columns=["image_id"])
        self.blacklist_ids: set[int] = set(
            blacklist_df["image_id"].astype(int).tolist()
        )

        self.datetime_by_image_id: dict[int, datetime] = {}
        for image_id, dt in zip(self.df["image_id"], self.df["datetime"]):
            key = int(image_id)
            if key not in self.datetime_by_image_id:
                self.datetime_by_image_id[key] = _parse_datetime(dt)

        self.datetime_by_path_key: dict[str, datetime] = {}
        if "path" in self.df.columns:
            for p, dt in zip(self.df["path"], self.df["datetime"]):
                if p is None or pd.isna(p):
                    continue
                key = self._normalize(str(p))
                if key.lower() in ("nan", "none"):
                    continue
                self.datetime_by_path_key.setdefault(key, _parse_datetime(dt))

    @staticmethod
    def _normalize(path: str) -> str:
        return str(path).replace("\\", "/").lstrip("./")

    def image_id(self, path: Path) -> int:
        try:
            return int(Path(path).stem[-self.pad :])
        except ValueError as exc:
            raise ValueError(
                f"Invalid image id in file name: {Path(path).stem}"
            ) from exc

    def is_blacklisted(self, file_name: Path) -> bool:
        if not self.blacklist_ids:
            return False
        return self.image_id(file_name) in self.blacklist_ids

    def _candidates(self, file_name: Path) -> tuple[str, ...]:
        file_name = Path(file_name)
        two_level = (
            "/".join(file_name.parts[-2:])
            if len(file_name.parts) >= 2
            else file_name.name
        )
        return (
            self._normalize(file_name.name),
            self._normalize(file_name.as_posix()),
            self._normalize(two_level),
        )

    def get_datetime(self, file_name: Path) -> Optional[datetime]:
        for key in self._candidates(file_name):
            dt = self.datetime_by_path_key.get(key)
            if dt is not None:
                return dt
        current_id = self.image_id(file_name)
        dt = self.datetime_by_image_id.get(current_id)
        if dt is None:
            raise ValueError(f"Image id {current_id} not found in protocol.")
        return dt

    def find_images_for_paths(self, paths: list) -> list:
        """Filter paths: keep protocolled, non-blacklisted images."""
        out = []
        for p in paths:
            try:
                if self.is_blacklisted(p):
                    continue
                self.get_datetime(p)
                out.append(p)
            except (ValueError, KeyError):
                continue
        return out

    def find_images_for_datetimes(
        self, paths: list, datetimes: list, tolerance_seconds: float = np.inf
    ) -> list:
        """For each target datetime, the closest protocolled image path."""
        valid = self.find_images_for_paths(paths)
        image_times = [self.get_datetime(p) for p in valid]
        out = []
        for target in datetimes:
            target = _parse_datetime(target)
            deltas = [
                abs((t - target).total_seconds()) for t in image_times
            ]
            if not deltas:
                out.append(None)
                continue
            best = int(np.argmin(deltas))
            out.append(valid[best] if deltas[best] <= tolerance_seconds else None)
        return out

    find_ideal_images_for_datetimes = find_images_for_datetimes


class InjectionProtocol:
    """Injection intervals -> cumulative injected mass."""

    def __init__(self, path) -> None:
        self.df = _normalize_injection_columns(_load_table(path))
        for col in ("start", "end"):
            self.df[col] = pd.to_datetime(self.df[col])
        self.num_injections = len(self.df)

    def injected_mass(
        self,
        date: Optional[datetime] = None,
        time: Optional[float] = None,
        roi=None,
    ) -> float:
        """Cumulative injected mass [kg] until date (or time in hours)."""
        if (date is None) == (time is None):
            raise ValueError("Provide exactly one of date or time.")
        mass = 0.0
        for _, row in self.df.iterrows():
            if roi is not None:
                loc = np.array([row["location_x"], row["location_y"]])
                roi_arr = np.asarray(roi)
                lo = roi_arr.min(axis=0)
                hi = roi_arr.max(axis=0)
                if not (
                    lo[0] <= loc[0] <= hi[0] and lo[1] <= loc[1] <= hi[1]
                ):
                    continue
            start = _parse_datetime(row["start"])
            end = _parse_datetime(row["end"])
            rate = float(row["rate_kg_s"])
            if date is not None:
                if date <= start:
                    passed = 0.0
                elif date < end:
                    passed = (date - start).total_seconds()
                else:
                    passed = (end - start).total_seconds()
            else:
                passed = float(
                    np.clip(time * 3600.0, 0.0, (end - start).total_seconds())
                )
            mass += passed * rate
        return mass


@dataclass
class ThermodynamicState:
    """Pressure [bar-ish, protocol units] and temperature [deg C]."""

    pressure: float
    temperature: float


class PressureTemperatureProtocol:
    """Time-interpolated pressure/temperature states."""

    def __init__(self, path) -> None:
        self.df = _load_table(path)
        self.df["datetime"] = pd.to_datetime(self.df["datetime"])
        self.df = self.df.sort_values("datetime")
        # Epoch seconds (robust to the pandas datetime storage unit).
        self._times = np.array(
            [pd.Timestamp(t).timestamp() for t in self.df["datetime"]]
        )
        # Accept the reference template column names as aliases.
        if "pressure" not in self.df and "pressure_bar" in self.df:
            self.df["pressure"] = self.df["pressure_bar"]
        if "temperature" not in self.df and "temperature_celsius" in self.df:
            self.df["temperature"] = self.df["temperature_celsius"]
        self._pressure = self.df["pressure"].to_numpy(dtype=float)
        self._temperature = self.df["temperature"].to_numpy(dtype=float)

    def get_state(self, date: datetime) -> ThermodynamicState:
        t = pd.Timestamp(date).timestamp()
        pressure = float(np.interp(t, self._times, self._pressure))
        temperature = float(np.interp(t, self._times, self._temperature))
        return ThermodynamicState(pressure=pressure, temperature=temperature)

    def get_gradient(self, date: datetime, dt_seconds: float = 60.0):
        t = pd.Timestamp(date).timestamp()
        p1 = np.interp(t + dt_seconds, self._times, self._pressure)
        p0 = np.interp(t - dt_seconds, self._times, self._pressure)
        t1 = np.interp(t + dt_seconds, self._times, self._temperature)
        t0 = np.interp(t - dt_seconds, self._times, self._temperature)
        return ThermodynamicState(
            pressure=float((p1 - p0) / (2 * dt_seconds)),
            temperature=float((t1 - t0) / (2 * dt_seconds)),
        )


class ImagingProtocolOld:
    """Interval-based imaging protocol (legacy format).

    Parity: reference ``experiment/protocols.py:55-130`` — maps trailing
    image-id digits in file names onto datetimes via ordered
    :class:`ImagingInterval` entries; json save/load.
    """

    def __init__(self, intervals: Optional[list] = None, pad: int = 5) -> None:
        self.intervals = intervals or []
        self.pad = pad

    def get_datetime(self, file_name: Path) -> Optional[datetime]:
        current_id = int(Path(file_name).stem[-self.pad:])
        interval = None
        for candidate in self.intervals:
            if candidate.contains(current_id):
                interval = candidate
            else:
                break  # intervals are chronologically ordered
        return interval.get_datetime(current_id) if interval else None

    def save(self, file_name: Path) -> None:
        import json

        data = {
            "pad": self.pad,
            "intervals": [
                {
                    "start_id": i.start_id,
                    "end_id": i.end_id,
                    "start_datetime": i.start_datetime.isoformat(),
                    "dt_seconds": i.dt_seconds,
                }
                for i in self.intervals
            ],
        }
        Path(file_name).write_text(json.dumps(data, indent=2))

    @classmethod
    def load(cls, file_name: Path) -> "ImagingProtocolOld":
        import json

        data = json.loads(Path(file_name).read_text())
        intervals = [
            ImagingInterval(
                start_id=int(entry["start_id"]),
                end_id=int(entry["end_id"]),
                start_datetime=datetime.fromisoformat(entry["start_datetime"]),
                dt_seconds=float(entry["dt_seconds"]),
            )
            for entry in data["intervals"]
        ]
        return cls(intervals=intervals, pad=int(data["pad"]))
