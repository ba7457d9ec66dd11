from paramugsy_tpu.lcb.merge import make_profiles_mem, merge_blocks, select_consistent

__all__ = ["make_profiles_mem", "merge_blocks", "select_consistent"]
