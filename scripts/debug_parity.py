"""Replay the parity-test trajectory to step N and diff move orderings.
Usage: python scripts/debug_parity.py N"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb
_xb._backend_factories.pop("axon", None)
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.ref_loader import load_reference_env
REF = load_reference_env()
from src.board.immutable_board import execute_full_move_on_board_copy
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.core import board as B

N = int(sys.argv[1])
env = REF.BackgammonEnv(match_length=3, device=None)
dice_rng = np.random.default_rng(20260819)
act_rng = np.random.default_rng(42)
def roll(): env.roll_result = [int(dice_rng.integers(1, 7)), int(dice_rng.integers(1, 7))]
env.roll_dice = roll
env.reset()
CFG = bg_env.EnvConfig(movegen=MovegenConfig.parity(512))

for step in range(1, N + 1):
    n_ref = int(env.action_mask.sum().item())
    if step == N:
        ob = REF.board_to_oracle(env.board)
        print("player", env.current_player, "dice", env.roll_result)
        print("board", ob.tolist())
        points = jnp.asarray(np.stack([ob[0:24], ob[24:48]])[None], jnp.int8)
        bar = jnp.asarray(ob[48:50][None], jnp.int8)
        off = jnp.asarray(ob[50:52][None], jnp.int8)
        turn = jnp.asarray([env.current_player.value], jnp.int8)
        dice = jnp.asarray([env.roll_result], jnp.int8)
        st = bg_env.make_state(points, bar, off, turn, dice, CFG)
        n = int(st.n_moves[0])
        print("ours n", n, "ref n", n_ref)
        ref_boards = []
        for i, mv in enumerate(env.legal_moves):
            subs = [(int(s.start), int(s.end)) for s in mv.sub_move_commands]
            rb = REF.board_to_oracle(execute_full_move_on_board_copy(env.board, mv))
            ref_boards.append(rb.astype(np.int8).tobytes())
            print("ref", i, subs)
        for i in range(n):
            vec = np.asarray(st.after[0, i])
            pts, b_, o_ = (np.asarray(x) for x in B.from_canonical(jnp.asarray(vec), turn[0]))
            ob2 = np.concatenate([pts[0], pts[1], b_, o_]).astype(np.int8)
            match = [j for j, rb in enumerate(ref_boards) if rb == ob2.tobytes()]
            print("ours", i, "-> ref", match)
        break
    if n_ref == 0 or env.game_over:
        action = 0
    elif act_rng.random() < 0.04 and n_ref + 3 < 500:
        action = n_ref + 3
    else:
        action = int(act_rng.integers(0, n_ref))
    env.step(action)
