"""Arrow-batch kernels and Catalyst expression builders."""
