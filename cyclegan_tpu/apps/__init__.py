"""User-facing applications: inference session, Streamlit UI, data flows."""

from cyclegan_tpu.apps.inference import InferenceSession

__all__ = ["InferenceSession"]
