"""Pure-NumPy/stdlib math kernels. No Spark imports here — these run inside
vectorized pandas UDFs on executors and in scalar form in unit tests."""
