from paramugsy_tpu.tree.guide_tree import GuideTree, guide_tree_of_seqs
from paramugsy_tpu.tree.job_tree import JobTree, make_job_tree

__all__ = ["GuideTree", "guide_tree_of_seqs", "JobTree", "make_job_tree"]
