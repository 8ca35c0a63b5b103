#pragma once
#include "glm/glm.hpp"

struct Light
{
    glm::vec3 position; 
    float intensity;
};