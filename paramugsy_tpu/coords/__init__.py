from paramugsy_tpu.coords.range import Range
from paramugsy_tpu.coords.profile import Profile

__all__ = ["Range", "Profile"]
