"""North-rule KG extraction over transcripts (BASELINE.json north_star):
window-ordered turns → batched mention detection → relation/triple
extraction, all vectorized pandas/Arrow UDFs (no per-row Python).
"""
