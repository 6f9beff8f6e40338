"""Pure-Python extraction kernels. No Spark imports allowed in this package.

Every kernel here is a deterministic function of bytes/strings so it can be
called from Arrow-batched UDFs (one batch = many documents) without any
per-row Python dispatch at the Spark plan level.
"""
