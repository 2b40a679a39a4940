"""Agents: DDiffPG + DIPO/TD3/SAC baselines.

Counterpart of `/root/reference/ddiffpg/algo/`, re-architected so that one
training iteration (explore horizon + update_times gradient steps) is a
single jitted, donated-state XLA program; Python touches the loop only at
eval/recluster cadence.
"""

from ddiffpg_tpu.agents.td3 import AgentTD3
from ddiffpg_tpu.agents.sac import AgentSAC
from ddiffpg_tpu.agents.dipo import AgentDIPO
from ddiffpg_tpu.agents.diffq import AgentDiffQ
from ddiffpg_tpu.agents.ddiffpg import AgentDDiffPG

AGENTS = {"TD3": AgentTD3, "SAC": AgentSAC, "DIPO": AgentDIPO,
          "DDiffPG": AgentDDiffPG, "DiffQ": AgentDiffQ}


def make_agent(name: str, env, cfg):
    name = name.replace("Agent", "")
    return AGENTS[name](env, cfg)
