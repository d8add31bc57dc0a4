"""Motor mixing: policy action [-1, 1]^4 -> per-rotor thrusts in N.

Rebuild of the reference's action mapping (SURVEY.md §3.2 step 1, BASELINE.json:5
"motor mixing and action mapping"). Mirrors oracle/drone_oracle.c:drone_mix
bit-exactly (same clamp, same multiply order).
"""

from __future__ import annotations

import jax.numpy as jnp


def mix(action, p, dr_thrust):
    """action: (4,) in [-1, 1] -> thrusts (4,) in [0, thrust_max*dr_thrust].

    f = clamp((a + 1) * 0.5, 0, 1);  F = f * thrust_max * dr_thrust
    """
    f = (action + 1.0) * 0.5
    f = jnp.minimum(jnp.maximum(f, 0.0), 1.0)
    return f * p.thrust_max * dr_thrust
