from .ppo import PPOAgent
from .sac import SACAgent
from .rule_based import RuleBasedGaterAgent, RuleBasedSeparatorAgent
from .batched_ppo import BatchedPPOTrainer

__all__ = ["PPOAgent", "SACAgent", "RuleBasedGaterAgent", "RuleBasedSeparatorAgent", "BatchedPPOTrainer"]
