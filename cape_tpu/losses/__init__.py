from .criterion import cape_criterion, token_ce_loss, coords_l1_loss

__all__ = ["cape_criterion", "token_ce_loss", "coords_l1_loss"]
