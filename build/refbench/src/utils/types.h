#pragma once

enum class Axis
{
    X = 0,
    Y = 1,
    Z = 2,
    NumAxes = 3,
};
