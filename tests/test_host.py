"""Host IO: rosbag reader round-trip on a synthesized bag, KITTI bin reader,
trajectory writer formats, synthetic IMU consistency."""

import struct

import numpy as np

from lidar_imu_slam_tpu.host import kitti, rosbag, synthetic
from lidar_imu_slam_tpu.utils import trajectory


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float) -> bytes:
    secs = int(stamp)
    nsecs = int((stamp - secs) * 1e9)
    return struct.pack("<III", 7, secs, nsecs) + _ros_string("base")


def _imu_msg(stamp, gyro, acc) -> bytes:
    out = _ros_header(stamp)
    out += struct.pack("<4d", 0, 0, 0, 1)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *gyro)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *acc)
    out += struct.pack("<9d", *([0.0] * 9))
    return out


def _pc2_msg(stamp, xyz: np.ndarray, times: np.ndarray) -> bytes:
    n = len(xyz)
    out = _ros_header(stamp)
    out += struct.pack("<II", 1, n)  # height, width
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1), (b"time", 12, 8, 1)]
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _ros_string(name.decode()) + struct.pack("<IBI", off, dt, cnt)
    point_step = 20
    out += struct.pack("<B", 0)  # little endian
    out += struct.pack("<II", point_step, point_step * n)
    buf = bytearray(n * point_step)
    for i in range(n):
        struct.pack_into("<fff", buf, i * point_step, *xyz[i])
        struct.pack_into("<d", buf, i * point_step + 12, times[i])
    out += struct.pack("<I", len(buf)) + bytes(buf)
    out += struct.pack("<B", 1)  # is_dense
    return out


def _make_bag(path, xyz, pt_times, imu_samples):
    """Minimal rosbag 2.0 with unchunked connection + message records."""
    conn_lidar = _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", 0), b"topic": b"/points"},
        _header({b"type": b"sensor_msgs/PointCloud2", b"md5sum": b"x",
                 b"message_definition": b"", b"topic": b"/points"}),
    )
    conn_imu = _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", 1), b"topic": b"/imu"},
        _header({b"type": b"sensor_msgs/Imu", b"md5sum": b"x",
                 b"message_definition": b"", b"topic": b"/imu"}),
    )
    msgs = b""
    for t, g, a in imu_samples:
        msgs += _record(
            {b"op": b"\x02", b"conn": struct.pack("<I", 1),
             b"time": struct.pack("<II", int(t), int((t - int(t)) * 1e9))},
            _imu_msg(t, g, a),
        )
    msgs += _record(
        {b"op": b"\x02", b"conn": struct.pack("<I", 0),
         b"time": struct.pack("<II", 10, 0)},
        _pc2_msg(10.0, xyz, pt_times),
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(conn_lidar + conn_imu + msgs)


class TestRosbag:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
        pt_times = 10.0 + np.linspace(0, 0.1, 50)
        imu = [(10.0 + 0.01 * i, rng.normal(0, 0.1, 3), rng.normal(0, 0.1, 3))
               for i in range(5)]
        path = str(tmp_path / "test.bag")
        _make_bag(path, xyz, pt_times, imu)

        lidar_msgs, imu_msgs = rosbag.read_sensor_streams(path)
        assert len(lidar_msgs) == 1 and len(imu_msgs) == 5
        msg = lidar_msgs[0]
        np.testing.assert_allclose(msg["fields"]["x"], xyz[:, 0], rtol=1e-6)
        np.testing.assert_allclose(msg["fields"]["time"], pt_times, rtol=1e-12)
        assert msg["stamp"] == 10.0
        np.testing.assert_allclose(imu_msgs[2]["gyro"], imu[2][1], rtol=1e-12)
        np.testing.assert_allclose(imu_msgs[2]["acc"], imu[2][2], rtol=1e-12)


class TestKitti:
    def test_bin_reader_and_rings(self, tmp_path):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-50, 50, (1000, 4)).astype(np.float32)
        path = str(tmp_path / "000000.bin")
        pts.tofile(path)
        loaded = kitti.read_velodyne_bin(path)
        np.testing.assert_array_equal(loaded, pts)
        rings = kitti.estimate_rings(loaded[:, :3])
        assert rings.min() >= 0 and rings.max() <= 63

    def test_sequence_iteration(self, tmp_path):
        seq = tmp_path / "00"
        (seq / "velodyne").mkdir(parents=True)
        rng = np.random.default_rng(2)
        for i in range(3):
            rng.uniform(-50, 50, (100, 4)).astype(np.float32).tofile(
                str(seq / "velodyne" / f"{i:06d}.bin")
            )
        np.savetxt(str(seq / "times.txt"), np.arange(3) * 0.1)
        s = kitti.KittiSequence(str(seq))
        msgs = list(s)
        assert len(msgs) == 3
        assert msgs[1]["stamp"] == 0.1
        assert msgs[0]["xyz"].shape == (100, 3)


class TestTrajectoryFormats:
    def test_tum_kitti_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        poses = []
        from lidar_imu_slam_tpu.ops import lie
        import jax.numpy as jnp

        for _ in range(5):
            poses.append(np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 0.5, 6)))))
        poses = np.stack(poses)
        tum = str(tmp_path / "t.tum")
        kit = str(tmp_path / "t.kitti")
        trajectory.write_tum(tum, np.arange(5) * 0.1, poses)
        trajectory.write_kitti(kit, poses)
        k = np.loadtxt(kit).reshape(-1, 3, 4)
        np.testing.assert_allclose(k, poses[:, :3, :4], rtol=1e-7, atol=1e-9)
        t = np.loadtxt(tum)
        assert t.shape == (5, 8)
        np.testing.assert_allclose(t[:, 1:4], poses[:, :3, 3], atol=1e-8)

    def test_ate_zero_for_identical(self):
        import jax.numpy as jnp
        from lidar_imu_slam_tpu.ops import lie

        rng = np.random.default_rng(4)
        poses = np.stack(
            [np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 1, 6)))) for _ in range(6)]
        )
        assert trajectory.ate_rmse(poses, poses, align=False) < 1e-12
        t, r = trajectory.rpe_rmse(poses, poses)
        assert t < 1e-12 and r < 1e-9


class TestSyntheticImu:
    def test_stationary_stream_measures_gravity(self):
        poses = np.tile(np.eye(4), (10, 1, 1))
        t, gyro, acc = synthetic.make_imu_stream(poses, 0.1, imu_rate=100.0)
        np.testing.assert_allclose(gyro, 0.0, atol=1e-9)
        np.testing.assert_allclose(acc[:, 2], 9.81, atol=1e-6)
