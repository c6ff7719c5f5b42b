from .ppo import PPOAgent
from .sac import SACAgent
from .rule_based import RuleBasedGaterAgent, RuleBasedSeparatorAgent
from .batched_ppo import BatchedPPOTrainer
from .batched_sac import BatchedSACTrainer

__all__ = ["PPOAgent", "SACAgent", "RuleBasedGaterAgent", "RuleBasedSeparatorAgent", "BatchedPPOTrainer", "BatchedSACTrainer"]
