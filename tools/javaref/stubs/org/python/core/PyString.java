package org.python.core;
public class PyString extends PyObject {
    private final String s;
    public PyString(String s) { this.s = s; }
    public String getString() { return s; }
}
