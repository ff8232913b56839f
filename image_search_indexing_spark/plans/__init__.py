"""End-to-end pipelines (the reference's MR jobs as DataFrame plans)."""
