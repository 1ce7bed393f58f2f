"""mlp_ppo_2ply_p3_tpu — TPU-native backgammon self-play RL framework.

A from-scratch JAX/XLA re-design of the capabilities of the reference
project Nick-qsv/MLP-PPO-2PLY-P3 (pure-Python + PyTorch backgammon PPO):

- ``core``     — pure-functional game kernel: board arrays, dice, the
                 fixed-shape legal-move enumerator, 198-dim TD-Gammon
                 feature encoding.  Everything ``jit``/``vmap``-able.
- ``env``      — batched lockstep environment (``reset``/``step`` as pure
                 functions over a ``(B, ...)`` state pytree).
- ``models``   — MLP policy/value networks as plain parameter pytrees.
- ``agents``   — random / greedy 1-ply / 2-ply expectimax / pubeval-style
                 baseline agents.
- ``ppo``      — on-device PPO: rollout ``lax.scan``, per-env GAE,
                 minibatched clipped updates with optax.
- ``parallel`` — device mesh construction + shardings for multi-chip /
                 multi-host data-parallel self-play.
- ``utils``    — config presets, checkpointing, metrics.
- ``ops``      — optional Pallas TPU kernels for hot paths.

Design notes (vs. the reference, see SURVEY.md):
- Legal moves are represented by their *afterstate boards* in a fixed
  ``(B, MAX_MOVES, ...)`` tensor + validity count; the env commits a move
  by gathering the chosen afterstate.  No per-move Python objects, no
  submove replay (reference: src/moves/move_types.py, FullMove lists).
- The whole rules engine runs on-device under ``jit``; the host↔chip data
  path is PRNG seeds in / metric scalars out (the reference syncs scalars
  per point per move: src/moves/move_logic.py:68 etc.).
"""

__version__ = "0.1.0"
