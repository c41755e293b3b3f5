"""Validation tooling: the independent numpy oracle of the reference's wired
odometry path, used by the trajectory-parity tests."""

from . import oracle  # noqa: F401
