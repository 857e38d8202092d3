"""L3 — continual-learning methods: EWC, LwF, replay.

Each method is (a) pure pytree functions usable inside the single jitted
train step, and (b) an ``after_task`` hook run between tasks (SURVEY.md §3.1).
Method state lives inside the train state pytree so checkpoints capture it
(SURVEY.md §3.5).
"""

from cl_tpu.methods.ewc import EWCState, ewc_after_task, make_ewc_state  # noqa: F401
from cl_tpu.methods.lwf import LwFState, lwf_after_task, make_lwf_state  # noqa: F401
from cl_tpu.methods.replay import ReplayBuffer  # noqa: F401
