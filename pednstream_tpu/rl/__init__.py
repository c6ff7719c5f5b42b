from .ppo import PPOAgent
from .sac import SACAgent
from .rule_based import RuleBasedGaterAgent, RuleBasedSeparatorAgent

__all__ = ["PPOAgent", "SACAgent", "RuleBasedGaterAgent", "RuleBasedSeparatorAgent"]
