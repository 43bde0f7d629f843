package javaref;

import java.util.HashMap;
import java.util.Map;
import java.util.Scanner;

/**
 * Ground-truth oracle for erex/javamap.py: reads groups of operations
 * from stdin (one per line, groups separated by a blank line), applies
 * each group to a fresh java.util.HashMap in input order, and prints
 * the map's iteration order (groups separated by a blank line).
 *
 * A line starting with '-' removes the rest of the line as a key
 * (HashMap.remove); any other line is a put.  Keys in these tests never
 * start with '-' themselves.
 */
public class HashOrder {
    public static void main(String[] args) {
        Scanner in = new Scanner(System.in);
        Map<String, Boolean> m = new HashMap<>();
        StringBuilder out = new StringBuilder();
        while (in.hasNextLine()) {
            String line = in.nextLine();
            if (line.isEmpty()) {
                for (String k : m.keySet()) out.append(k).append('\n');
                out.append('\n');
                m = new HashMap<>();
            } else if (line.startsWith("-")) {
                m.remove(line.substring(1));
            } else {
                m.put(line, Boolean.TRUE);
            }
        }
        for (String k : m.keySet()) out.append(k).append('\n');
        System.out.print(out);
    }
}
