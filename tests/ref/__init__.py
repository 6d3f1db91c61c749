"""Pure-Python per-sample reference models of the Lua reference's semantics.

These transliterate the algorithms of /root/reference/aukit.lua as slow,
obviously-correct Python loops (the golden-vector role from SURVEY.md §4 —
the Lua runtime itself is unavailable in this environment). The framework's
vectorized/batched implementations are asserted equal against these.
"""
