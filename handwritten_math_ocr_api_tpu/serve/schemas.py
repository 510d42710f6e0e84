"""Request/response schemas (wire-compatible with the reference API).

Field names, types and constraints match the reference's pydantic models
(reference: app/src/models.py:4-70) so existing clients keep working:
PredictionResponse{formula, confidence in [0,1], processing_time,
timestamp}, BatchPredictionRequest{images: 1..10 base64 strings}, etc.
Implemented on pydantic v2.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field, field_validator

MAX_BATCH_IMAGES = 10


class PredictionRequest(BaseModel):
    image_data: Optional[str] = Field(
        None, description="Base64 encoded image data")


class PredictionResponse(BaseModel):
    formula: str = Field(..., description="Predicted LaTeX formula")
    confidence: Optional[float] = Field(None, ge=0.0, le=1.0)
    processing_time: float = Field(..., ge=0.0)
    timestamp: str


class BatchPredictionRequest(BaseModel):
    images: List[str] = Field(..., min_length=1,
                              max_length=MAX_BATCH_IMAGES)

    @field_validator("images")
    @classmethod
    def validate_images(cls, v):
        if len(v) > MAX_BATCH_IMAGES:
            raise ValueError(
                f"Maximum {MAX_BATCH_IMAGES} images allowed per batch")
        return v


class BatchPredictionResponse(BaseModel):
    results: List[Dict[str, Any]]
    total_images: int
    successful_predictions: int
    processing_time: float
    timestamp: str


class StatusResponse(BaseModel):
    status: str
    api_version: str
    model_loaded: bool
    vocab_loaded: bool
    device: str
    model_load_time: Optional[float] = None
    total_predictions: int
    uptime: float


class HealthResponse(BaseModel):
    healthy: bool
    checks: Dict[str, Any]
    timestamp: str


class ErrorResponse(BaseModel):
    error: str
    detail: str
    timestamp: str
