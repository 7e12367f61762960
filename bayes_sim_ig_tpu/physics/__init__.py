"""From-scratch TPU rigid-body physics: spatial algebra, articulated
dynamics (CRBA/RNEA + dense SPD solve), penalty contacts.

Replaces the PhysX GPU engine the reference drives through Isaac Gym
(SURVEY.md §2.2). Single-env pure functions composed under vmap; static
topology unrolled at trace time.
"""

from .model import ArticulatedModel, LinkSpec, Geom, DynParams, JOINT_DOF
from .dynamics import (
    forward_kinematics, forward_dynamics, integrate, mass_matrix,
    bias_forces, clamp_limits, dof_positions, carried_mass_factor,
)
from .contact import ground_contact_forces, contact_points

__all__ = [
    "ArticulatedModel", "LinkSpec", "Geom", "DynParams", "JOINT_DOF",
    "forward_kinematics", "forward_dynamics", "integrate", "mass_matrix",
    "bias_forces", "clamp_limits", "dof_positions",
    "carried_mass_factor",
    "ground_contact_forces", "contact_points",
]
