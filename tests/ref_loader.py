"""Load the reference implementation (/root/reference) as a differential
test oracle, stubbing out its unavailable heavy deps (boto3, gym,
tensorboardX, tqdm).  Read-only use: we call its move generator to verify
our clean-room rules oracle reproduces its behavior exactly.
"""

from __future__ import annotations

import sys
import types

REF_PATH = "/root/reference"


def _stub_module(name: str, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_loaded = None


def load_reference():
    """Returns a namespace with the reference's rules API, or None if the
    reference tree is unavailable."""
    global _loaded
    if _loaded is not None:
        return _loaded
    import os

    if not os.path.isdir(REF_PATH):
        return None

    # ---- stubs for deps the image doesn't ship -----------------------------
    class _ClientError(Exception):
        pass

    boto3 = _stub_module("boto3", client=lambda *a, **k: None)
    botocore = _stub_module("botocore")
    exc = _stub_module("botocore.exceptions", ClientError=_ClientError)
    cfg = _stub_module("botocore.config", Config=lambda *a, **k: None)
    botocore.exceptions = exc
    botocore.config = cfg

    class _S3RecordWriter:
        def __init__(self, *a, **k):
            pass

    class _SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def close(self):
            pass

    rec_writer = _stub_module(
        "tensorboardX.record_writer",
        S3RecordWriter=_S3RecordWriter,
        RecordWriter=_S3RecordWriter,
    )
    tbx = _stub_module(
        "tensorboardX", SummaryWriter=_SummaryWriter, record_writer=rec_writer
    )
    tbx.record_writer = rec_writer

    class _GymEnv:
        pass

    class _Space:
        def __init__(self, *a, **k):
            self.n = k.get("n", 0)

    spaces = _stub_module("gym.spaces", Box=_Space, Discrete=_Space)
    gym = _stub_module("gym", Env=_GymEnv, spaces=spaces)
    gym.spaces = spaces
    _stub_module("tqdm", tqdm=lambda it, **k: it)

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    agent_dir = REF_PATH + "/src/agent"
    if agent_dir not in sys.path:
        sys.path.append(agent_dir)  # for train.py's flat `from config import *`

    try:
        import torch  # noqa: F401
        from src.board.immutable_board import ImmutableBoard  # noqa
        from src.moves.get_all_moves import get_all_possible_moves  # noqa
        from src.players.player import Player  # noqa
    except Exception as e:  # pragma: no cover
        print(f"reference unavailable: {e}")
        return None

    import torch
    import numpy as np

    ns = types.SimpleNamespace()
    ns.torch = torch
    ns.ImmutableBoard = ImmutableBoard
    ns.get_all_possible_moves = get_all_possible_moves
    ns.Player = Player

    def board_from_oracle(ob: np.ndarray) -> "ImmutableBoard":
        """oracle (52,) int8 absolute board -> reference ImmutableBoard."""
        t = torch.zeros((4, 24), dtype=torch.int8)
        t[0, :] = torch.from_numpy(ob[0:24].astype("int8"))
        t[1, :] = torch.from_numpy(ob[24:48].astype("int8"))
        t[2, 0], t[2, 1] = int(ob[48]), int(ob[49])
        t[3, 0], t[3, 1] = int(ob[50]), int(ob[51])
        return ImmutableBoard(t)

    def board_to_oracle(ib) -> np.ndarray:
        t = ib.tensor.numpy()
        ob = np.zeros(52, dtype=np.int8)
        ob[0:24] = t[0]
        ob[24:48] = t[1]
        ob[48], ob[49] = t[2, 0], t[2, 1]
        ob[50], ob[51] = t[3, 0], t[3, 1]
        return ob

    ns.board_from_oracle = board_from_oracle
    ns.board_to_oracle = board_to_oracle
    _loaded = ns
    return ns


def load_reference_env():
    """Returns the live reference BackgammonEnv class (plus the base
    namespace), or None if unavailable.  Used by the exact-trajectory
    parity test (tests/test_trajectory_parity.py)."""
    ns = load_reference()
    if ns is None:
        return None
    if not hasattr(ns, "BackgammonEnv"):
        try:
            from src.environment.backgammon_env import BackgammonEnv  # noqa
        except Exception as e:  # pragma: no cover
            print(f"reference env unavailable: {e}")
            return None
        ns.BackgammonEnv = BackgammonEnv
    return ns
