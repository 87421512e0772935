"""Native (C++) host runtime: ground-truth oracle, bucket-table builder,
rank scoring — the framework's equivalents of the reference's C host side
(``/root/reference/alg.c:252-266``, ``test_correctness.c:207-262``).
Compiled on demand; numpy fallbacks keep everything working without g++."""

from .lib import available, brute_force_knn, bucket_table, rank_guesses

__all__ = ["available", "brute_force_knn", "bucket_table", "rank_guesses"]
