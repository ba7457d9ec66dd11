from paramugsy_tpu.runtime.scheduler import PriorityScheduler
from paramugsy_tpu.runtime.executor import JobExecutor

__all__ = ["PriorityScheduler", "JobExecutor"]
