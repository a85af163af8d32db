"""Host-side utilities: TensorBoard writer, image IO, run-dir layout."""
