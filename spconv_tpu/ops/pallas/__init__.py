from .implicit_gemm import build_igemm_plan, igemm_tile_matmul, implicit_gemm
