"""Dataset conversion + reference checkpoint interop.

Heavy imports (torch, cv2, the jax backbone) stay inside submodules.
"""
