"""Analysis tools: Grad-CAM and attention rollout."""
