"""Scalar/vector function kernels shared by the NumPy oracle and Spark UDFs."""
