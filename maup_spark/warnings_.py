"""Warning contracts mirroring the reference's categories.

Reference classes: OverlapWarning / IslandWarning
(/root/reference/maup/adjacencies.py:10-15), AssigmentWarning
(/root/reference/maup/assign.py:9 — reference's own spelling kept as an
alias), AreaCroppingWarning (/root/reference/maup/repair.py:43).

Emitting a warning requires a count, and a count is a Spark job — so
diag counting is OPT-IN per call (``warn_for_*`` flags, reference-
compatible names).  Operators that already hold the counts (doctor,
adjacency_stats) surface them in their stats dicts for free.
"""

from __future__ import annotations


class OverlapWarning(UserWarning):
    """The layer contains positive-area pairwise overlaps."""


class IslandWarning(UserWarning):
    """Some geometries touch no other geometry."""


class AssignmentWarning(UserWarning):
    """Some source units were left unassigned."""


AssigmentWarning = AssignmentWarning  # reference spelling alias


class AreaCroppingWarning(UserWarning):
    """Cropping produced zero-area geometries (large source/target
    union mismatch)."""
