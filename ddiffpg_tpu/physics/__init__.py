"""From-scratch rigid-body physics, pure JAX.

Replaces the reference's native simulators (MuJoCo 2.1 C via mujoco-py for
the ant, PyBullet C++ for the panda — SURVEY.md §2.2) with a
generalized-coordinate articulated dynamics engine designed for
`vmap`-over-thousands-of-envs execution inside a jitted `lax.scan`:

  quat.py        quaternion algebra
  types.py       Model / State containers
  builder.py     model construction + mass properties from geoms
  algebra.py     spatial (6D) vector helpers, world-origin convention
  engine.py      FK, CRBA, RNEA, penalty contacts, semi-implicit Euler
  ant.py         the low-gear ant (reference assets/low_gear_ant.xml)
  maze.py        maze grid -> static box scene (reference maze_env.py)
  panda.py       7-DoF Franka arm + task furniture
"""
