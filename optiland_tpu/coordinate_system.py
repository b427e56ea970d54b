"""Chained coordinate systems with recursive reference-CS composition.

Mirrors the reference's ``CoordinateSystem(x, y, z, rx, ry, rz,
reference_cs)`` (reference: optiland/coordinate_system.py:28-167):
``localize``/``globalize`` apply translation + Euler rotations to ray
bundles, recursing through the reference chain, and
``get_effective_transform`` flattens the chain into one rigid transform.

TPU-first difference: the trace kernels never walk a CS chain. The system
builder calls :meth:`effective_euler_transform` at compile time to fold an
arbitrary chain into the flat per-surface (dx, dy, dz, rx, ry, rz) record
the fused kernels consume — chain recursion is a build-time concept, not a
trace-time one. The rotation convention matches the reference exactly:
R = Rz @ Ry @ Rx (globalize applies Rx, Ry, Rz in that order,
reference: coordinate_system.py:92-107,120-142).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _rot_matrix(rx: float, ry: float, rz: float) -> np.ndarray:
    """R = Rz @ Ry @ Rx (reference: coordinate_system.py:120-142)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def euler_xyz_from_matrix(R: np.ndarray) -> tuple[float, float, float]:
    """Extrinsic x-y-z Euler angles with R = Rz(c) @ Ry(b) @ Rx(a).

    (reference: coordinate_system.py:166+ uses scipy ``as_euler('xyz')``;
    implemented directly to keep this a pure-numpy build-time utility.)
    """
    b = np.arcsin(np.clip(-R[2, 0], -1.0, 1.0))
    if abs(R[2, 0]) < 1.0 - 1e-12:
        a = np.arctan2(R[2, 1], R[2, 2])
        c = np.arctan2(R[1, 0], R[0, 0])
    else:  # gimbal lock: fold everything into a
        a = np.arctan2(-R[1, 2], R[1, 1])
        c = 0.0
    return float(a), float(b), float(c)


@dataclass
class CoordinateSystem:
    """A 3D coordinate frame, optionally defined relative to another.

    (reference: optiland/coordinate_system.py:28-107)
    """

    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0
    reference_cs: "CoordinateSystem | None" = None

    # ---------------- ray transforms (host-side helpers) ----------------

    def localize(self, rays):
        """Global -> local transform of a RealRays bundle
        (reference: coordinate_system.py:73-89)."""
        from optiland_tpu.ops import kernels

        if self.reference_cs is not None:
            rays = self.reference_cs.localize(rays)
        x = rays.x - self.x
        y = rays.y - self.y
        z = rays.z - self.z
        L, M, N = rays.L, rays.M, rays.N
        x, y, L, M = kernels.rotate_z(x, y, L, M, -self.rz)
        x, z, L, N = kernels.rotate_y(x, z, L, N, -self.ry)
        y, z, M, N = kernels.rotate_x(y, z, M, N, -self.rx)
        return rays.replace(x=x, y=y, z=z, L=L, M=M, N=N)

    def globalize(self, rays):
        """Local -> global transform (reference: coordinate_system.py:92)."""
        from optiland_tpu.ops import kernels

        x, y, z = rays.x, rays.y, rays.z
        L, M, N = rays.L, rays.M, rays.N
        y, z, M, N = kernels.rotate_x(y, z, M, N, self.rx)
        x, z, L, N = kernels.rotate_y(x, z, L, N, self.ry)
        x, y, L, M = kernels.rotate_z(x, y, L, M, self.rz)
        rays = rays.replace(
            x=x + self.x, y=y + self.y, z=z + self.z, L=L, M=M, N=N
        )
        if self.reference_cs is not None:
            rays = self.reference_cs.globalize(rays)
        return rays

    # ---------------- effective (flattened) transform ----------------

    def get_rotation_matrix(self) -> np.ndarray:
        return _rot_matrix(self.rx, self.ry, self.rz)

    def get_effective_transform(self) -> tuple[np.ndarray, np.ndarray]:
        """(translation, rotation) of this frame in global coordinates
        (reference: coordinate_system.py:144-164)."""
        t = np.array([self.x, self.y, self.z], float)
        R = self.get_rotation_matrix()
        if self.reference_cs is None:
            return t, R
        ref_t, ref_R = self.reference_cs.get_effective_transform()
        return ref_t + ref_R @ t, ref_R @ R

    def effective_euler_transform(self):
        """Flatten the chain: ((dx, dy, dz), (rx, ry, rz)) in global frame.

        This is what the system builder consumes: the returned flat record
        reproduces the full chain's localize/globalize exactly (any rigid
        transform is one translation + one Rz@Ry@Rx rotation).
        """
        t, R = self.get_effective_transform()
        return (float(t[0]), float(t[1]), float(t[2])), euler_xyz_from_matrix(R)

    @property
    def position_in_gcs(self) -> tuple[float, float, float]:
        """Origin position in global coordinates
        (reference: coordinate_system.py:110-118)."""
        t, _ = self.get_effective_transform()
        return float(t[0]), float(t[1]), float(t[2])

    # ---------------- serialization ----------------

    def to_dict(self) -> dict:
        d = {
            "x": float(self.x), "y": float(self.y), "z": float(self.z),
            "rx": float(self.rx), "ry": float(self.ry), "rz": float(self.rz),
        }
        if self.reference_cs is not None:
            d["reference_cs"] = self.reference_cs.to_dict()
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "CoordinateSystem":
        ref = d.get("reference_cs")
        return cls(
            x=d.get("x", 0.0), y=d.get("y", 0.0), z=d.get("z", 0.0),
            rx=d.get("rx", 0.0), ry=d.get("ry", 0.0), rz=d.get("rz", 0.0),
            reference_cs=cls.from_dict(ref) if ref else None,
        )


__all__ = ["CoordinateSystem", "euler_xyz_from_matrix"]
